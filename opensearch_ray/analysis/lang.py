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

SWEDISH_STOP = frozenset("""och det att i en jag hon som han på den med var
sig för så till är men ett om hade de av icke mig du henne då sin nu har
inte hans honom skulle hennes där min man ej vid kunde något från ut när
efter upp vi dem vara vad över än dig kan sina här ha mot alla under någon
eller allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt
ni bli blev oss din dessa några deras blir mina samma vilken er sådan vår
blivit dess inom mellan sådant varför varje vilka ditt vem vilket sitta
sådana vart dina vars vårt våra ert era vilkas
""".split())

NORWEGIAN_STOP = frozenset("""og i jeg det at en et den til er som på de med
han av ikke ikkje der så var meg seg men ett har om vi min mitt ha hadde hun
nå over da ved fra du ut sin dem oss opp man kan hans hvor eller hva skal
selv sjøl her alle vil bli ble blei bli? blitt kunne inn når være kom noen
noe ville dere som deres kun ja etter ned skulle denne for deg si sine sitt
mot å meget hvorfor dette disse uten hvordan ingen din ditt blir samme
hvilken hvilke sånn inni mellom vår hver hvem vors hvis både bare enn fordi
før mange også slik vært
""".split())

DANISH_STOP = frozenset("""og i jeg det at en den til er som på de med han af
for ikke der var mig sig men et har om vi min havde ham hun nu over da fra
du ud sin dem os op man hans hvor eller hvad skal selv her alle vil blev
kunne ind når være dog noget ville jo deres efter ned skulle denne end
dette mit også under have dig anden hende mine alt meget sit sine vor mod
disse hvis din nogle hos blive mange ad bliver hendes været thi jer sådan
""".split())

FINNISH_STOP = frozenset("""olla olen olet on olemme olette ovat ole oli
olisi olisit olisin olisimme olisitte olisivat olit olin olimme olitte
olivat ollut olleet en et ei emme ette eivät minä minun minut minua minussa
minusta minuun minulla minulta minulle sinä sinun hän hänen se sen sitä me
te he ketä kuka mikä mitä missä mistä joka jonka jota jossa josta johon ja
jos koska kun niin nyt sekä mutta vaan tai vai eli että sitten tässä tätä
tämä nämä ne noin myös jo vielä vain kanssa mukaan ilman ennen jälkeen yli
alle paljon kaikki muut itse
""".split())

HUNGARIAN_STOP = frozenset("""a ahogy ahol aki akik akkor alatt által
általában amely amelyek amelyekben amelyeket amelyet amelynek ami amit
amolyan amíg amikor át abban ahhoz annak arra arról az azok azon azt azzal
azért aztán azután azonban bár be belül benne cikk de e eddig egész egy
egyes egyetlen egyéb egyik egyre ekkor el elég ellen elő először előtt első
én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen ezzel ezért és fel
felé hanem hiszen hogy hogyan igen így illetve ill ilyen ilyenkor ison ismét
itt jó jól jobban kell kellett keresztül keressünk ki kívül között közül
legalább lehet lehetett legyen lenne lenni lesz lett maga magát majd meg még
mellett mert mely melyek mi mit míg miért milyen mikor minden mindent
mindenki mindig mint mintha mivel most nagy nagyobb nagyon ne néha nekem
neki nem néhány nélkül nincs olyan ott össze ő ők őket pedig persze rá s
saját sem semmi sok sokat sokkal számára szemben szerint szinte talán tehát
teljes tovább továbbá több úgy ugyanis új újabb újra után utána utolsó vagy
vagyis valaki valami valamint való vagyok van vannak volt voltam voltak
voltunk vissza vele viszont volna
""".split())

CZECH_STOP = frozenset("""a aby ale ani asi až bez bude budem budeš by byl
na ve je jsou byla byli bylo být co či další do ho i jak jake jako jeho jej její jejich
jen ještě ji jiné jiz již jsem jseš jsme jsou jste k kam kde kdo když ke
která které který kteři kterou než nic nové nový o od on ona oni ono pak po
pod podle pokud pouze právě pro proč proto protože první před přes při s se
si sice strana své svůj svých svým svými ta tak také takže tato te tě tedy
ten tento této tím tímto to tohle toho tohoto tom tomto tomuto tu tuto ty
tyto u už v vám více však všechen z za zde ze že
""".split())

ROMANIAN_STOP = frozenset("""acea aceasta această aceea acei aceia acel
acela acele acelea acest acesta aceste acestea acestui acolo acum ai aia
aibă aici al ăla ale alea altceva altcineva am ar are aş aşadar asemenea
asta ăsta astăzi astea ăstea ăştia asupra aţi au avea avem aveţi azi bine
bucur bună ca că căci când care cărei căror cărui cât câte câţi către câtva
ce cel ceva chiar cînd cine cineva cît cîte cîţi cîtva contra cu cum cumva
da dă dacă dar datorită de deci deja deoarece departe deşi din dinaintea
dintr dintre drept după ea ei el ele eram este eşti eu face fără fi fie
fiecare fii fim fiţi iar ieri îi îl îmi împotriva în înainte înaintea
încât încît încotro între întrucât întrucît îţi la lângă le li lîngă lor
lui mă mâine mea mei mele mereu meu mi mine mult multă mulţi ne nicăieri
nici nimeni nimic nişte noastră noastre noi noştri nostru nu ori oricând
oricare oricât orice oricînd oricine oricît oricum oriunde până pe pentru
peste pînă poate pot prea prima primul prin printr sa să săi sale sau său
se şi sînt sîntem sînteţi spre sub sunt suntem sunteţi te ţi ţie toată
toate tot toţi totuşi tu un una unde undeva unei unele uneori unor vă vi
voastră voastre voi voştri vostru vouă vreo vreun
""".split())

BULGARIAN_STOP = frozenset("""а ако ала бе без беше би бил била били било
близо бъдат бъде бяха в вас ваш ваша вероятно вече взема ви вие винаги все
всеки всички всичко всяка във въпреки върху г ги главно го д да дали до
докато докога дори досега доста е едва един ето за зад заедно заради засега
затова защо защото и из или им има имат иска й каза как каква какво както
какъв като кога когато което които кой който колко която къде където към ли
м ме между мен ми мнозина мога могат може моля момента му н на над назад
най направи напред например нас не него нея ни ние никой нито но някои
някой няма обаче около освен особено от отгоре отново още пак по повече
повечето под поне поради после почти прави пред преди през при пък първо с
са само се сега си скоро след сме според сред срещу сте съм със също т тази
така такива такъв там твой те тези ти то това тогава този той толкова
точно трябва тук тъй тя тях у харесва ч че често чрез ще щом я
""".split())

INDONESIAN_STOP = frozenset("""yang dan di ke dari ini itu dengan untuk pada
adalah sebagai dalam tidak akan ada mereka dia kami kita saya kamu anda bisa
oleh juga karena jika telah sudah saat ketika seperti atau tapi tetapi namun
hanya lebih sangat harus masih setelah sebelum antara semua para secara
sehingga yaitu bahwa maka kepada terhadap tersebut begitu sini situ mana
siapa apa kenapa bagaimana berapa
""".split())

TURKISH_STOP = frozenset("""acaba ama ancak aslında az bazı belki biri
birkaç birşey biz bu buna bunda bundan bunlar bunları bunun burada çok çünkü
da daha de defa diye eğer en gibi hem hep hepsi her hiç için ile ise kez ki
kim mı mi mu mü nasıl ne neden nedenle nerde nerede nereye niçin niye o olan
olarak oldu olduğu onlar onların onu onun öyle oysa sanki şey siz şu tüm ve
veya ya yani
""".split())

BRAZILIAN_STOP = PORTUGUESE_STOP

CATALAN_STOP = frozenset("""a al als abans algun alguna algunes alguns altre amb
ambdós anar ans aquell aquelles aquells aquest aquesta aquestes aquests així
bastant bé cada com consegueixo conseguim conseguir considera considerar
contra d dalt de des dins el elles ells els em en ens entre era erem eren
és éssent està estan estat estava estem esteu estic estàvem fa faig fan fas
fem fer feu fi ha han has haver hi ho i inclòs jo la les li llavors mateix
mateixa mateixes mateixos me meu meus meva molt molts mentre mode nosaltres
o on per perquè però pot potser primer puc qual quals quan quant que què qui
sabem saber sap saps sense ser seu seus seva seves si soc solament sols som
sota també te tene tenim tenir teniu tinc teu teus teva tot un una unes uns
ús va vaig van vosaltres
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


def swedish_light_stem(w: str) -> str:
    """SwedishLightStemmer-style: definite/plural endings."""
    w = _strip_first(w, ("heterna", "heten", "heter", "arna", "erna", "orna",
                         "ande", "arne", "aste", "ande", "erns"), 4)
    w = _strip_first(w, ("are", "ast", "het", "ens", "ern", "ets"), 4)
    w = _strip_first(w, ("ar", "er", "or", "en", "et", "na", "at"), 4)
    w = _strip_first(w, ("a", "e", "n", "t", "s"), 4)
    return w


def norwegian_light_stem(w: str) -> str:
    """NorwegianLightStemmer-style: -ing and definite/plural endings."""
    w = _strip_first(w, ("hetene", "hetens", "heter", "heten", "endes",
                         "ingen", "inger", "ingene"), 4)
    w = _strip_first(w, ("ende", "enes", "edes", "ings", "else"), 4)
    w = _strip_first(w, ("ane", "ene", "ens", "ers", "ets", "ing", "het",
                         "ert", "est"), 4)
    w = _strip_first(w, ("en", "ar", "er", "as", "es", "et", "st"), 4)
    w = _strip_first(w, ("a", "e", "n", "t", "s"), 4)
    return w


def danish_light_stem(w: str) -> str:
    """Danish light (Snowball Danish is also suffix-stripping)."""
    w = _strip_first(w, ("erendes", "erende", "hedens", "ethed", "erede",
                         "heden", "heder", "endes", "erens", "erets"), 4)
    w = _strip_first(w, ("ende", "eren", "erer", "eres", "eret", "heds"), 4)
    w = _strip_first(w, ("ene", "ens", "ere", "ers", "ets", "hed"), 4)
    w = _strip_first(w, ("en", "er", "es", "et", "e", "s"), 4)
    return w


def finnish_light_stem(w: str) -> str:
    """FinnishLightStemmer-style: case endings + possessives (subset)."""
    w = _strip_first(w, ("isiin", "ssa", "ssä", "sta", "stä", "lla", "llä",
                         "lta", "ltä", "lle", "ksi", "ine", "han", "hän",
                         "iin", "een"), 4)
    w = _strip_first(w, ("ni", "si", "mme", "nne", "nsa", "nsä"), 4)
    w = _strip_first(w, ("it", "et", "at", "ut", "yt", "ia", "iä", "ja",
                         "jä"), 4)
    w = _strip_first(w, ("a", "ä", "i", "n", "t", "e"), 4)
    return w


def hungarian_light_stem(w: str) -> str:
    """HungarianLightStemmer-style: case suffixes + plural (subset)."""
    w = _strip_first(w, ("okkal", "ekkel", "ökkel", "aknak", "eknek",
                         "okban", "ekben", "ökben", "ainak", "einek"), 4)
    w = _strip_first(w, ("ban", "ben", "nak", "nek", "val", "vel", "tól",
                         "től", "ról", "ről", "ból", "ből", "hoz", "hez",
                         "höz", "nál", "nél", "ára", "ére", "kal", "kel"), 4)
    w = _strip_first(w, ("ok", "ek", "ök", "ak", "on", "en", "ön", "an",
                         "at", "et", "ot", "öt", "ra", "re", "ba", "be",
                         "ig", "ul", "ül"), 4)
    w = _strip_first(w, ("a", "e", "o", "á", "é", "t", "k", "n"), 4)
    return w


def czech_light_stem(w: str) -> str:
    """CzechStemmer-style (light): case endings."""
    w = _strip_first(w, ("atech", "ětem", "atům", "ech", "ich", "ích",
                         "ého", "ěmi", "emi", "ému", "ěte", "ěti", "iho",
                         "ímu", "ími", "ách", "ými", "ami", "ové", "ovi",
                         "ého"), 4)
    w = _strip_first(w, ("em", "es", "ém", "ím", "ům", "at", "ám", "os",
                         "us", "ým", "mi", "ou", "ův"), 4)
    w = _strip_first(w, ("a", "e", "i", "o", "u", "y", "á", "é", "í", "ý",
                         "ě", "ů"), 4)
    return w


def romanian_light_stem(w: str) -> str:
    w = _strip_first(w, ("ilor", "ului", "elor", "iile", "iilor", "atei",
                         "aţie", "aţia", "ează", "escu", "eşti"), 4)
    w = _strip_first(w, ("ile", "uri", "ata", "ate", "aţi", "ele", "eze",
                         "ant", "ent"), 4)
    w = _strip_first(w, ("ul", "ua", "ea", "le", "ii", "ie", "iu", "at",
                         "ut", "it"), 4)
    w = _strip_first(w, ("a", "e", "i", "u", "ă"), 4)
    return w


def bulgarian_light_stem(w: str) -> str:
    """BulgarianStemmer-style (light): definite articles + plural."""
    w = _strip_first(w, ("овете", "евете", "овцете", "ищата", "ията"), 4)
    w = _strip_first(w, ("ове", "еве", "ата", "ята", "ите", "ето", "ият",
                         "ньо", "ища"), 4)
    w = _strip_first(w, ("ът", "то", "те", "та", "ия", "ът"), 4)
    w = _strip_first(w, ("а", "я", "о", "е", "и"), 4)
    return w


def indonesian_light_stem(w: str) -> str:
    """IndonesianStemmer-style (light): particles + common affixes."""
    w = _strip_first(w, ("kah", "lah", "pun", "nya"), 4)
    for pre in ("meng", "meny", "men", "mem", "me", "peng", "peny", "pen",
                "pem", "di", "ter", "ke", "ber", "per", "se"):
        if w.startswith(pre) and len(w) - len(pre) >= 3:
            w = w[len(pre):]
            break
    w = _strip_first(w, ("kan", "an", "i"), 3)
    return w


def turkish_light_stem(w: str) -> str:
    """Light Turkish: common case/possessive suffixes (subset of the
    snowball Turkish suffix list; no vowel-harmony modeling)."""
    for _ in range(2):
        w = _strip_first(w, ("larının", "lerinin", "larında", "lerinde",
                             "larından", "lerinden"), 4)
        w = _strip_first(w, ("ların", "lerin", "lara", "lere", "ları",
                             "leri", "larda", "lerde", "dan", "den", "tan",
                             "ten", "nın", "nin", "nun", "nün", "ında",
                             "inde"), 4)
        w = _strip_first(w, ("lar", "ler", "da", "de", "ta", "te", "ın",
                             "in", "un", "ün", "ı", "i", "u", "ü", "a",
                             "e"), 4)
    return w


def catalan_light_stem(w: str) -> str:
    w = _strip_first(w, ("aments", "ament", "acions", "ació", "adors",
                         "ador", "ances", "ança"), 4)
    w = _strip_first(w, ("es", "os", "ns"), 4)
    w = _strip_first(w, ("a", "e", "o", "s", "í"), 4)
    return w


# ------------------------------------------------ round-3 tail languages
# Normalizer + light-stemmer approximations for the non-Latin-script and
# remaining analyzers of CommonAnalysisModulePlugin.java:204-244. Same
# fidelity contract as the rest of this module: documented rule SUBSETS of
# the Lucene filters (ArabicNormalizationFilter, GreekStemmer, ...), not
# bit-compatible ports.

_AR_DIACRITICS = re.compile("[ً-ْٰـ]")  # harakat+tatweel


def arabic_normalize(w: str) -> str:
    """ArabicNormalizationFilter: strip tatweel/diacritics, unify alef
    forms, teh marbuta -> heh, alef maksura -> yeh."""
    w = _AR_DIACRITICS.sub("", w)
    w = (w.replace("آ", "ا").replace("أ", "ا")
          .replace("إ", "ا")              # آ أ إ -> ا
          .replace("ة", "ه")              # ة -> ه
          .replace("ى", "ي"))             # ى -> ي
    return w


def arabic_light_stem(w: str) -> str:
    """ArabicStemmer (light10 style): strip واـ/الـ prefixes and common
    suffixes."""
    w = arabic_normalize(w)
    for pre in ("وال", "بال",
                "كال", "فال",
                "ال", "و"):
        if w.startswith(pre) and len(w) - len(pre) >= 2:
            w = w[len(pre):]
            break
    for suf in ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي"):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            w = w[:-len(suf)]
            break
    return w


def persian_normalize(w: str) -> str:
    """PersianNormalizationFilter: arabic yeh/kaf -> farsi forms, strip
    heh-ye, zwnj -> removed."""
    return (w.replace("ي", "ی").replace("ك", "ک")
             .replace("ة", "ه").replace("‌", ""))


def sorani_light_stem(w: str) -> str:
    """SoraniStemmer subset: strip common Kurdish suffixes."""
    for suf in ("ەکان", "ەکە",
                "ان", "ە", "ی"):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            return w[:-len(suf)]
    return w


def hindi_normalize(w: str) -> str:
    """HindiNormalizer subset: drop nukta, unify anusvara variants."""
    return w.replace("़", "").replace("ँ", "ं")


def hindi_light_stem(w: str) -> str:
    """HindiStemmer: strip the common case/number suffixes."""
    w = hindi_normalize(w)
    for suf in ("ों", "ें", "ां",
                "ओं", "ईं",
                "ा", "ी", "ीं", "े", "ो",
                "ु", "ू", "ै", "ं"):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            return w[:-len(suf)]
    return w


def bengali_light_stem(w: str) -> str:
    """BengaliStemmer subset: strip common inflection suffixes."""
    for suf in ("গুলো", "গুলি",
                "ের", "রা", "ে", "র",
                "া", "ি", "ী"):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            return w[:-len(suf)]
    return w


_GREEK_ACCENTS = str.maketrans("άέήίόύώΐΰϊϋ", "αεηιουωιυιυ")


def greek_lower(w: str) -> str:
    """GreekLowerCaseFilter: lowercase + final sigma + accent folding."""
    return w.lower().replace("ς", "σ").translate(_GREEK_ACCENTS)


def greek_light_stem(w: str) -> str:
    """GreekStemmer subset: strip frequent noun/adjective endings."""
    w = greek_lower(w)
    for suf in ("ματων", "ματα", "ουσα", "ουμε", "ετε",
                "ουν", "ους", "ων", "ου", "ος", "ες", "ας", "ης", "οι",
                "αι", "α", "η", "ο", "ι"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


def armenian_light_stem(w: str) -> str:
    for suf in ("ություն", "ների", "ներ", "երի", "եր", "ում", "ի", "ը"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


def basque_light_stem(w: str) -> str:
    for suf in ("etako", "etan", "aren", "ekin", "ari", "ak", "en",
                "an", "a", "k"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


def estonian_light_stem(w: str) -> str:
    for suf in ("dele", "dest", "desse", "tele", "test", "sse", "ste",
                "del", "ga", "ks", "le", "lt", "st", "te", "de", "d",
                "t", "s"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


def galician_light_stem(w: str) -> str:
    for suf in ("acions", "acion", "mente", "cion", "ns", "es", "os",
                "as", "a", "o", "e"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


def irish_lower(w: str) -> str:
    """IrishLowerCaseFilter: strip initial mutation prefixes (t-, n-) and
    the pre-vowel t/n before lowercasing."""
    if len(w) > 2 and w[1] == "-" and w[0] in "tn":
        w = w[2:]
    elif len(w) > 1 and w[0] in "tn" and w[1] in "AEIOUÁÉÍÓÚ":
        w = w[1:]
    return w.lower()


def irish_light_stem(w: str) -> str:
    for suf in ("acha", "anna", "aibh", "air", "anna", "acht", "adh",
                "ai", "a", "e", "i"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


def latvian_light_stem(w: str) -> str:
    for suf in ("iem", "ajam", "ajai", "am", "as", "ai", "us", "os",
                "es", "em", "a", "e", "i", "u", "s"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


def lithuanian_light_stem(w: str) -> str:
    for suf in ("iams", "uose", "ams", "ais", "oms", "ose", "as", "is",
                "ys", "us", "ai", "os", "ui", "a", "e", "i", "o", "u",
                "s"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[:-len(suf)]
    return w


LIGHT_STEMMERS: dict = {
    "german": german_light_stem,
    "french": french_light_stem,
    "spanish": spanish_light_stem,
    "italian": italian_light_stem,
    "portuguese": portuguese_light_stem,
    "brazilian": portuguese_light_stem,
    "dutch": dutch_light_stem,
    "russian": russian_light_stem,
    "swedish": swedish_light_stem,
    "norwegian": norwegian_light_stem,
    "danish": danish_light_stem,
    "finnish": finnish_light_stem,
    "hungarian": hungarian_light_stem,
    "czech": czech_light_stem,
    "romanian": romanian_light_stem,
    "bulgarian": bulgarian_light_stem,
    "indonesian": indonesian_light_stem,
    "turkish": turkish_light_stem,
    "catalan": catalan_light_stem,
    "arabic": arabic_light_stem,
    "sorani": sorani_light_stem,
    "hindi": hindi_light_stem,
    "bengali": bengali_light_stem,
    "greek": greek_light_stem,
    "armenian": armenian_light_stem,
    "basque": basque_light_stem,
    "estonian": estonian_light_stem,
    "galician": galician_light_stem,
    "irish": irish_light_stem,
    "latvian": latvian_light_stem,
    "lithuanian": lithuanian_light_stem,
}

# compact Lucene-stop-set subsets for the tail languages
ARABIC_STOP = frozenset("""من في على و ان الى عن مع هذا هذه ذلك التي الذي
كان كانت هو هي ما لا لم لن قد كل بعد قبل بين او اذا ثم حتى لكن منذ عند
""".split())

PERSIAN_STOP = frozenset("""و در به از که این را با است برای آن یک خود تا
بر هم نیز اما یا اگر هر ما من او شما آنها بود شد می های ها
""".split())

SORANI_STOP = frozenset("""و لە بە بۆ کە ئەم ئەو لەگەڵ هەر بەڵام ئەگەر
""".split())

HINDI_STOP = frozenset("""के का की है में और से को पर यह वह ने कि जो भी नहीं
तो था थी थे हैं हो ही एक अपने इस उस कुछ
""".split())

BENGALI_STOP = frozenset("""এবং ও এর যে এই সে তার করে না হয় থেকে জন্য একটি
আমি তুমি তিনি কি কিন্তু বা আছে ছিল হবে
""".split())

GREEK_STOP = frozenset("""ο η το οι τα του της των τον την και κι κ ειμαι
εισαι ειναι ειμαστε ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ
παρα αντι κατα τι που ποιοσ ποια ποιο να δεν μην επι ενω εαν αν οτι
""".split())

ARMENIAN_STOP = frozenset("""և ու այս այդ այն է են էր եմ ես enk որ ինչ
բայց կամ նաև համար մեջ վրա
""".split())

BASQUE_STOP = frozenset("""eta edo da dira zen ziren du dute bat batzuk
hau hori hura ere ez bai baina zer nor non
""".split())

ESTONIAN_STOP = frozenset("""ja on ei et see ta mis kui aga ka oli ole ma
sa me te nad oma või siis veel
""".split())

GALICIAN_STOP = frozenset("""a o as os un unha e de do da dos das en que non
se por para con como mais pero ao aos
""".split())

IRISH_STOP = frozenset("""agus an na is ar le i go do mo a ag ach bhí tá
sé sí mé tú siad ní nach seo sin
""".split())

LATVIAN_STOP = frozenset("""un ir es tu viņš viņa mēs jūs no uz ar par ka
kas bet vai ja šis tas bija būt
""".split())

LITHUANIAN_STOP = frozenset("""ir yra aš tu jis ji mes jūs iš į su apie kad
kas bet ar jei šis tas buvo būti
""".split())

CJK_STOP = frozenset("""a and are as at be but by for if in into is it no
not of on or such that the their then there these they this to was will
with www
""".split())

THAI_STOP = frozenset("""ที่ การ และ ใน ของ มี ไม่ ให้ ได้ ว่า เป็น จะ กับ
แต่ หรือ ก็ นี้ นั้น
""".split())

LANG_STOPWORDS: dict = {
    "german": GERMAN_STOP,
    "french": FRENCH_STOP,
    "spanish": SPANISH_STOP,
    "italian": ITALIAN_STOP,
    "portuguese": PORTUGUESE_STOP,
    "brazilian": BRAZILIAN_STOP,
    "dutch": DUTCH_STOP,
    "russian": RUSSIAN_STOP,
    "swedish": SWEDISH_STOP,
    "norwegian": NORWEGIAN_STOP,
    "danish": DANISH_STOP,
    "finnish": FINNISH_STOP,
    "hungarian": HUNGARIAN_STOP,
    "czech": CZECH_STOP,
    "romanian": ROMANIAN_STOP,
    "bulgarian": BULGARIAN_STOP,
    "indonesian": INDONESIAN_STOP,
    "turkish": TURKISH_STOP,
    "catalan": CATALAN_STOP,
    "arabic": ARABIC_STOP,
    "persian": PERSIAN_STOP,
    "sorani": SORANI_STOP,
    "hindi": HINDI_STOP,
    "bengali": BENGALI_STOP,
    "greek": GREEK_STOP,
    "armenian": ARMENIAN_STOP,
    "basque": BASQUE_STOP,
    "estonian": ESTONIAN_STOP,
    "galician": GALICIAN_STOP,
    "irish": IRISH_STOP,
    "latvian": LATVIAN_STOP,
    "lithuanian": LITHUANIAN_STOP,
    "cjk": CJK_STOP,
    "thai": THAI_STOP,
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
