"""Analyzer conformance goldens — mirrors the reference's `_analyze` YAML
suite (rest-api-spec/test/indices.analyze/10_analyze.yml style)."""

import pyarrow as pa
import pytest

from opensearch_ray.analysis import analyze, analyze_batch, ENGLISH_STOP_WORDS
from opensearch_ray.analysis.analyzer import ANALYZERS, transcript_analyzer
from opensearch_ray.analysis.token_filters import (
    make_shingle_filter, make_edge_ngram_filter, porter_stem, unique_filter,
    asciifolding_filter, make_elision_filter, word_delimiter_filter,
)
from opensearch_ray.analysis.tokenizers import (
    standard_tokenizer, whitespace_tokenizer, letter_tokenizer,
    make_pattern_tokenizer, make_path_hierarchy_tokenizer,
    make_edge_ngram_tokenizer, uax_url_email_tokenizer,
)


GOLDENS = [
    # (analyzer, input, expected tokens)
    ("transcript", "The Quick Brown-Foxes jumped!", ["quick", "brown", "foxes", "jumped"]),
    ("transcript", "", []),
    ("transcript", "the and of to", []),
    ("standard", "The Quick Brown-Foxes jumped!", ["the", "quick", "brown", "foxes", "jumped"]),
    ("standard", "can't O'Brien", ["can't", "o'brien"]),
    ("standard", "3.14 1,000 v2_beta", ["3.14", "1,000", "v2_beta"]),
    ("standard", "漢字搜索", ["漢", "字", "搜", "索"]),
    ("simple", "Foo3Bar baz", ["foo", "bar", "baz"]),
    ("whitespace", "Foo Bar-baz  qux", ["Foo", "Bar-baz", "qux"]),
    ("keyword", "New York", ["New York"]),
    ("fingerprint", "b a c a B", ["a b c"]),
]


@pytest.mark.parametrize("an,text,expected", GOLDENS)
def test_analyzer_goldens(an, text, expected):
    assert analyze(text, an) == expected


def test_positions_keep_stopword_gaps():
    toks, poss = transcript_analyzer.analyze("the quick brown the fox")
    assert toks == ["quick", "brown", "fox"]
    assert poss == [1, 2, 4]  # gaps where stopwords were removed


def test_max_token_length_split():
    long = "x" * 300
    toks = standard_tokenizer(long)
    assert toks == ["x" * 255, "x" * 45]


def test_tokenizers():
    assert letter_tokenizer("abc123def") == ["abc", "def"]
    assert whitespace_tokenizer(" a  b ") == ["a", "b"]
    assert make_pattern_tokenizer(",")("a,b,,c") == ["a", "b", "c"]
    assert make_path_hierarchy_tokenizer()("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert make_edge_ngram_tokenizer(1, 3)("quick") == ["q", "qu", "qui"]
    assert "https://example.com/x?y=1" in uax_url_email_tokenizer(
        "see https://example.com/x?y=1 or mail a.b@example.co"
    )
    assert "a.b@example.co" in uax_url_email_tokenizer("mail a.b@example.co now")


def test_token_filters():
    t, p = make_shingle_filter(2, 2)(["a", "b", "c"], [0, 1, 2])
    assert t == ["a", "a b", "b", "b c", "c"]
    t, p = make_edge_ngram_filter(1, 2)(["ab"], [0])
    assert t == ["a", "ab"]
    assert porter_stem("running") == "run"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    t, _ = unique_filter(["a", "b", "a"], [0, 1, 2])
    assert t == ["a", "b"]
    t, _ = asciifolding_filter(["café", "naïve"], [0, 1])
    assert t == ["cafe", "naive"]
    t, _ = make_elision_filter()(["l'avion"], [0])
    assert t == ["avion"]
    t, _ = word_delimiter_filter(["PowerShot500", "wi-fi"], [0, 1])
    assert t == ["Power", "Shot", "500", "wi", "fi"]


def test_stopword_set_is_lucene_classic_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"the", "and", "of", "with", "will"} <= set(ENGLISH_STOP_WORDS)
    assert "from" not in ENGLISH_STOP_WORDS  # famously absent from Lucene's list


def test_analyze_batch_matches_scalar():
    texts = ["The Quick fox", "", "can't stop won't stop", "漢字 test THE"]
    tbl = pa.table({"text": texts})
    out = analyze_batch(tbl, analyzer="transcript")
    got = out.column("tokens").to_pylist()
    want = [analyze(t, "transcript") for t in texts]
    assert got == want
    # positions path
    out2 = analyze_batch(tbl, analyzer="transcript", positions_column="pos")
    for i, t in enumerate(texts):
        toks, poss = transcript_analyzer.analyze(t)
        assert out2.column("tokens").to_pylist()[i] == toks
        assert out2.column("pos").to_pylist()[i] == poss


def test_new_tokenizers():
    from opensearch_ray.analysis.tokenizers import TOKENIZERS
    assert TOKENIZERS["classic"]("The U.S.A.'s O'Neil's car") == \
        ["The", "USA", "O'Neil", "car"]
    assert TOKENIZERS["simple_pattern"](r"[0-9]+")("ab 12 cd 345") == ["12", "345"]
    assert TOKENIZERS["simple_pattern_split"](r"-")("a-b-c") == ["a", "b", "c"]
    assert TOKENIZERS["thai"]("hello สวัสดี world") == \
        ["hello", "สวัสดี", "world"]


def test_language_analyzers():
    from opensearch_ray.analysis import analyze
    assert analyze("The runner's dogs are running quickly", "english") == \
        ["runner", "dog", "run", "quickli"]
    # stopwords removed + light stems applied per language
    assert "der" not in analyze("Die Häuser der Kinder", "german")
    assert analyze("Die Häuser der Kinder", "german") == ["haus", "kind"]
    fr = analyze("les maisons nationaux de l'homme", "french")
    assert fr == ["maison", "national", "homm"]
    assert "los" not in analyze("las casas de los niños", "spanish")
    for lang in ("italian", "portuguese", "dutch", "russian", "pattern"):
        assert analyze("some text", lang) is not None  # registered


def test_graph_filters():
    from opensearch_ray.analysis.token_filters import TOKEN_FILTERS
    wd = TOKEN_FILTERS["word_delimiter_graph"]
    assert wd(["PowerShot-500"], [0]) == (
        ["PowerShot500", "Power", "Shot", "500"], [0, 0, 0, 0])
    syn = TOKEN_FILTERS["synonym_graph"]({"ny": ["new york"]})
    assert syn(["in", "ny", "today"], [0, 1, 2]) == (
        ["in", "ny", "new", "york", "today"], [0, 1, 1, 2, 2])
    mux = TOKEN_FILTERS["multiplexer"]([[], [TOKEN_FILTERS["porter_stem"]]])
    assert mux(["running"], [0]) == (["running", "run"], [0, 0])
    st = TOKEN_FILTERS["stemmer"]("german")
    assert st(["häuser"], [0]) == (["haus"], [0])


def test_snowball_porter2():
    """Porter2 (snowball english) — expectations traced through the
    published algorithm steps (snowballstem.org); differs from Porter1
    where the algorithms differ (e.g. agreed -> agre, conditional ->
    condit, generously -> generous)."""
    from opensearch_ray.analysis.token_filters import snowball_english
    cases = {
        "caresses": "caress", "flies": "fli", "dies": "die", "mules": "mule",
        "denied": "deni", "died": "die", "agreed": "agre", "owned": "own",
        "sized": "size", "meeting": "meet", "stating": "state",
        "plotted": "plot", "generously": "generous", "cats": "cat",
        "knightly": "knight", "conditional": "condit", "rational": "ration",
        "valency": "valenc", "hesitancy": "hesit", "digitizer": "digit",
        "radically": "radic", "differently": "differ", "vileness": "vile",
        "hopefulness": "hope", "electricity": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "relational": "relat", "sky": "sky", "dying": "die",
        "news": "news", "skis": "ski",
    }
    bad = {w: (snowball_english(w), want) for w, want in cases.items()
           if snowball_english(w) != want}
    assert not bad, bad


def test_kstem_common_grams_min_hash():
    from opensearch_ray.analysis.token_filters import (
        kstem, make_common_grams_filter, make_min_hash_filter, TOKEN_FILTERS)
    assert kstem("running") == "run" and kstem("cats") == "cat"
    assert kstem("cities") == "city" and kstem("boxes") == "box"
    assert kstem("sing") == "sing"  # protected word, not a plural/gerund
    cg = TOKEN_FILTERS["common_grams"]({"the", "of"})
    toks, pos = cg(["the", "quick", "fox", "of", "fire"], [0, 1, 2, 3, 4])
    assert "the_quick" in toks and "of_fire" in toks and "fox_of" in toks
    assert toks.index("the_quick") == toks.index("the") + 1
    # query mode drops unigrams that participate in a gram
    cgq = make_common_grams_filter({"the", "of"}, query_mode=True)
    toks_q, _ = cgq(["the", "quick", "fox", "of", "fire"], [0, 1, 2, 3, 4])
    assert toks_q == ["the_quick", "fox_of", "of_fire"]
    # non-adjacent (position gap) tokens never form grams
    toks_g, _ = cg(["the", "fox"], [0, 2])
    assert toks_g == ["the", "fox"]
    # min_hash: deterministic, bucketed, rotation fills all buckets
    mh = make_min_hash_filter(bucket_count=8)
    t1, p1 = mh(["ab", "cd", "ef"], [0, 1, 2])
    t2, _ = mh(["ab", "cd", "ef"], [0, 1, 2])
    assert t1 == t2 and len(t1) == 8 and p1 == list(range(8))
    assert all(len(x) == 16 for x in t1)
    no_rot = make_min_hash_filter(bucket_count=8, with_rotation=False)
    t3, _ = no_rot(["ab", "cd", "ef"], [0, 1, 2])
    assert 1 <= len(t3) <= 3


def test_language_analyzers_extended():
    """Round-3 language tail: 12 more prebuilt analyzers (light stemmers +
    Snowball-derived stop subsets, flagged approximations)."""
    from opensearch_ray.analysis import get_analyzer
    cases = {
        "swedish": ("flickorna springer och hoppar", "och"),
        "norwegian": ("hustypene er fine", "er"),
        "danish": ("bogen ligger på bordet", "på"),
        "finnish": ("talossa on kissa", "on"),
        "hungarian": ("a házakban laknak", "a"),
        "czech": ("ve městech bydlí lidé", "ve"),
        "romanian": ("copiii merg la școală", "la"),
        "bulgarian": ("децата играят в парка", "в"),
        "indonesian": ("mereka membaca buku di perpustakaan", "di"),
        "turkish": ("evlerinde kitaplar var", "ve"),
        "catalan": ("els nens juguen al parc", "els"),
        "brazilian": ("as crianças brincam no parque", "no"),
    }
    for lang, (text, stopword) in cases.items():
        an = get_analyzer(lang)
        toks = an.tokens(text)
        assert toks, lang
        assert stopword not in toks, (lang, toks)
    # stemming collapses inflections within a language
    sw = get_analyzer("swedish")
    assert sw.tokens("flickorna")[0] == sw.tokens("flickor")[0]
    idn = get_analyzer("indonesian")
    assert idn.tokens("membaca")[0] == idn.tokens("baca")[0]


def test_round3_language_analyzers_goldens():
    """Tail languages of CommonAnalysisModulePlugin.java:204-244 (documented
    light approximations — see analysis.lang docstring)."""
    from opensearch_ray.analysis.analyzer import get_analyzer
    cases = {
        "arabic": ("الكتاب والمكتبة", ["كتاب", "مكتب"]),
        "persian": ("كتاب‌ها و این", ["کتاب"]),
        "greek": ("Οι ωραίες θάλασσες", ["ωραιεσ", "θαλασσεσ"]),
        "hindi": ("किताबों और लड़के", ["किताब", "लडक"]),
        "bengali": ("বইগুলো এবং ছেলের", ["বই", "ছেল"]),
        "irish": ("an t-uisce agus na tithe", ["uisc", "tith"]),
        "latvian": ("grāmatas un mājas", ["grāmat", "māj"]),
        "cjk": ("据报道 today 中文分词",
                ["据报", "报道", "today", "中文", "文分", "分词"]),
        "chinese": ("the 中文 test", ["中", "文", "test"]),
        "thai": ("การทดสอบ hello ที่ดี", ["การทดสอบ", "hello", "ที่ดี"]),
        "estonian": ("raamatud ja majad", ["raamatu", "maja"]),
        "lithuanian": ("knygos ir namai", ["knyg", "nam"]),
    }
    for lang, (text, want) in cases.items():
        got = get_analyzer(lang).tokens(text)
        assert got == want, f"{lang}: {got} != {want}"


def test_cjk_bigram_isolated_and_positions():
    from opensearch_ray.analysis.token_filters import cjk_bigram_filter
    # isolated ideograph stays a unigram; runs become overlapping bigrams
    toks, pos = cjk_bigram_filter(
        ["中", "ok", "文", "分", "词"], [0, 1, 2, 3, 4])
    assert toks == ["中", "ok", "文分", "分词"]
    assert pos == [0, 1, 2, 3]
    # position gap (e.g. after a stop filter) breaks the bigram chain
    toks2, _ = cjk_bigram_filter(["中", "文"], [0, 2])
    assert toks2 == ["中", "文"]


def test_inline_custom_analyzer_spec():
    """The `_analyze` API's inline chain definition
    (TransportAnalyzeAction): names and {"type": ...} objects compose,
    and the dict spec works anywhere a named analyzer does."""
    from opensearch_ray.analysis.analyzer import (build_custom_analyzer,
                                                  get_analyzer)

    spec = {"tokenizer": "whitespace",
            "char_filter": ["html_strip"],
            "filter": ["lowercase",
                       {"type": "edge_ngram", "min_gram": 2,
                        "max_gram": 3}]}
    an = build_custom_analyzer(spec)
    assert an.tokens("<b>Hello</b> World") == ["he", "hel", "wo", "wor"]
    # dict spec accepted transparently by get_analyzer
    assert get_analyzer(spec).tokens("<i>Hi</i> You") \
        == an.tokens("<i>Hi</i> You")
    # parameterized tokenizer object + zero-arg factory filter by name
    an2 = build_custom_analyzer({
        "tokenizer": {"type": "ngram", "min_gram": 2, "max_gram": 2},
        "filter": ["unique"]})
    assert an2.tokens("abca") == ["ab", "bc", "ca"]
    # ships to Ray workers: cloudpickle round-trip (factory filters are
    # closures — stdlib pickle can't, Ray's serializer can)
    from ray import cloudpickle
    assert cloudpickle.loads(cloudpickle.dumps(an)) \
        .tokens("<b>Go</b> Far") == an.tokens("<b>Go</b> Far")


def test_annotated_text_analyzer():
    """annotated_text (plugins/mapper-annotated-text): annotations are
    single un-analyzed tokens at the covered span's FIRST position
    (positionIncrement 0); covered text analyzes normally; URL-decoded,
    &-separated multi-annotations."""
    from opensearch_ray.analysis.analyzer import get_analyzer
    an = get_analyzer("annotated_text")
    t, p = an.analyze("visit [New York](city&Big%20Apple) soon")
    assert list(zip(t, p)) == [("visit", 0), ("new", 1), ("york", 2),
                               ("city", 1), ("Big Apple", 1), ("soon", 3)]
    # stopword gaps preserved across annotated spans
    t2, p2 = an.analyze("[Paris](city) is big")
    assert list(zip(t2, p2)) == [("paris", 0), ("city", 0), ("big", 2)]
    # plain text passes through the base chain untouched
    t3, p3 = an.analyze("no annotations here")
    assert t3 == ["no", "annotations"] or "here" in t3
