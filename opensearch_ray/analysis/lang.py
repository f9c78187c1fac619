"""Language analyzers: per-language stopwords + stemmers.

Reference: the ~35 prebuilt language analyzers registered in
modules/analysis-common/.../CommonAnalysisModulePlugin.java:204-244 (each =
standard tokenizer + lowercase + language stop set + language stemmer, with
elision for French/Italian/Catalan, possessive stripping for English).

Stemming fidelity note: English uses the full Porter algorithm (in
token_filters.porter_stem). The other languages use LIGHT suffix-stripping
stemmers in the style of Savoy's light stemmers (the `light_german`,
`light_french`, ... options of the reference's stemmer filter,
StemmerTokenFilterFactory.java) — documented approximations of the Snowball
defaults, NOT bit-compatible with them. Stop lists are the common Snowball
subsets.
"""

from __future__ import annotations

import re
from typing import Callable

# ------------------------------------------------------------- stop lists
# (Snowball-derived common subsets; lowercase)

GERMAN_STOP = frozenset("""aber alle allem allen aller alles als also am an
ander andere anderem anderen anderer anderes auch auf aus bei bin bis bist da
damit dann das dass dein deine dem den der des dessen die dies diese diesem
diesen dieser dieses doch dort du durch ein eine einem einen einer eines er
es etwas für hab habe haben hat hatte hatten hier hin hinter ich ihr ihre im
in ist ja jede jedem jeden jeder jedes kann kein keine können man mehr mein
meine mit muss nach nicht nichts noch nun nur ob oder ohne sehr sein seine
sich sie sind so über um und uns unser unter vom von vor war waren was weil
weiter wenn wer werde werden wie wieder will wir wird wirst wo zu zum zur
""".split())

FRENCH_STOP = frozenset("""au aux avec ce ces dans de des du elle en et eux il
ils je la le les leur lui ma mais me même mes moi mon ne nos notre nous on ou
où par pas pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
votre vous c d j l à m n s t y été étée être es est suis sont sera serait
était étaient ai as avons avez ont aura aurait avait avaient
""".split())

SPANISH_STOP = frozenset("""a al algo algunos ante antes como con contra cual
cuando de del desde donde durante e el ella ellas ellos en entre era eran es
esa esas ese eso esos esta estas este esto estos fue fueron ha han hasta hay
la las le les lo los más me mi mis mucho muy nada ni no nos nosotros o os
otra otros para pero poco por porque que quien se sin sobre son su sus también
tanto te tiene tienen todo todos tu tus un una uno unos vosotros y ya yo
""".split())

ITALIAN_STOP = frozenset("""a ad al alla alle allo anche avere aveva che chi
ci come con cui da dal dalla de degli dei del della delle dello di dove e ed
era erano essere fa fare fu gli ha hanno ho i il in io la le lei li lo loro
lui ma mi mia mio ne nei nel nella no noi non nostro o per perché più quale
quando quella quelle quelli quello questa queste questi questo qui se sei si
sia solo sono su sua sue sui sul sulla suo tra tu tua tuo tutti tutto un una
uno vi voi
""".split())

PORTUGUESE_STOP = frozenset("""a ao aos aquela aquele as até com como da das
de dela dele dem depois do dos e ela elas ele eles em entre era essa esse
esta este eu foi for foram há isso isto já lhe lhes mais mas me mesmo meu
minha muito na nas não nem no nos nossa nosso num numa o os ou para pela
pelo por qual quando que quem se sem ser seu sua são só também te tem tu tua
tudo um uma você vocês
""".split())

DUTCH_STOP = frozenset("""aan al alles als altijd andere ben bij daar dan dat
de der deze die dit doch doen door dus een eens en er ge geen geweest haar
had heb hebben heeft hem het hier hij hoe hun iemand iets ik in is ja je kan
kon kunnen maar me meer men met mij mijn moet na naar niet niets nog nu of
om omdat onder ons ook op over reeds te tegen toch toen tot u uit uw van veel
voor want waren was wat werd wezen wie wil worden wordt zal ze zelf zich zij
zijn zo zonder zou
""".split())

RUSSIAN_STOP = frozenset("""а без более бы был была были было быть в вам вас
весь во вот все всего всех вы где да даже для до его ее если есть еще же за
здесь и из или им их к как ко когда кто ли либо мне может мы на надо наш не
него нее нет ни них но ну о об однако он она они оно от очень по под при с
со так также такой там те тем то того тоже той только том ты у уже хотя чего
чей чем что чтобы чье чья эта эти это я
""".split())


# --------------------------------------------------------- light stemmers

def _strip_first(word: str, suffixes, min_stem: int) -> str:
    for suf in suffixes:
        if word.endswith(suf) and len(word) - len(suf) >= min_stem:
            return word[: -len(suf)]
    return word


def german_light_stem(w: str) -> str:
    w = (w.replace("ä", "a").replace("ö", "o").replace("ü", "u")
         .replace("ß", "ss"))
    w = _strip_first(w, ("nen",), 4)
    w = _strip_first(w, ("en", "se", "es", "er", "em", "e", "n", "s"), 4)
    w = _strip_first(w, ("e", "n", "s"), 4)
    return w


def french_light_stem(w: str) -> str:
    if len(w) > 5 and w.endswith("aux"):
        return w[:-3] + "al"
    w = _strip_first(w, ("issement", "issant", "atrice", "ateur", "ation",
                         "ement", "euses", "euse", "ique", "eurs", "eur",
                         "ions", "ion", "ites", "ite", "ees", "es", "er",
                         "ee", "e", "s", "x"), 4)
    return w


def spanish_light_stem(w: str) -> str:
    w = _strip_first(w, ("amientos", "imientos", "amiento", "imiento",
                         "aciones", "acion", "adores", "ador", "antes",
                         "ante", "anzas", "anza", "ibles", "ible"), 4)
    w = _strip_first(w, ("os", "as", "es"), 4)
    w = _strip_first(w, ("o", "a", "e"), 4)
    return w


def italian_light_stem(w: str) -> str:
    w = _strip_first(w, ("azione", "azioni", "amento", "amenti", "imento",
                         "imenti", "mente", "atore", "atori"), 4)
    w = _strip_first(w, ("i", "e", "a", "o"), 4)
    return w


def portuguese_light_stem(w: str) -> str:
    w = re.sub("ões$|ão$", "ao", w)
    w = _strip_first(w, ("amentos", "imentos", "amento", "imento", "adores",
                         "ador", "ações", "ação", "antes", "ante"), 4)
    w = _strip_first(w, ("os", "as", "es"), 4)
    w = _strip_first(w, ("o", "a", "e"), 4)
    return w


def dutch_light_stem(w: str) -> str:
    w = _strip_first(w, ("heden", "heid", "ingen", "ing"), 4)
    w = _strip_first(w, ("en", "es", "s", "e"), 4)
    return w


def russian_light_stem(w: str) -> str:
    w = _strip_first(w, ("иями", "ями", "ами", "ием", "ием", "иях", "ях",
                         "ах", "ей", "ой", "ий", "ый", "ая", "яя", "ое",
                         "ее", "ие", "ые", "ов", "ев", "ам", "ям", "ом",
                         "ем", "ах", "ях", "ть", "ет", "ют", "ат", "ят"), 4)
    w = _strip_first(w, ("и", "ы", "а", "я", "о", "е", "у", "ю", "ь"), 4)
    return w


LIGHT_STEMMERS: dict = {
    "german": german_light_stem,
    "french": french_light_stem,
    "spanish": spanish_light_stem,
    "italian": italian_light_stem,
    "portuguese": portuguese_light_stem,
    "dutch": dutch_light_stem,
    "russian": russian_light_stem,
}

LANG_STOPWORDS: dict = {
    "german": GERMAN_STOP,
    "french": FRENCH_STOP,
    "spanish": SPANISH_STOP,
    "italian": ITALIAN_STOP,
    "portuguese": PORTUGUESE_STOP,
    "dutch": DUTCH_STOP,
    "russian": RUSSIAN_STOP,
}


def english_possessive_strip(w: str) -> str:
    """EnglishPossessiveFilter: strip trailing 's / ’s."""
    if len(w) > 2 and (w.endswith("'s") or w.endswith("’s")):
        return w[:-2]
    return w


def make_stemmer(language: str) -> Callable[[str], str]:
    """The `stemmer` token-filter factory (StemmerTokenFilterFactory):
    english -> full Porter, others -> the light stemmers above."""
    if language in ("english", "porter", "porter2"):
        from .token_filters import porter_stem
        return porter_stem
    try:
        return LIGHT_STEMMERS[language]
    except KeyError:
        raise ValueError(f"no stemmer for language {language!r}") from None
