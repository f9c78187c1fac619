"""Round-4 token-filter tail goldens.

Cases mirror rest-api-spec/test/indices.analyze/10_analyze.yml shapes and
the Lucene filter javadocs cited in analysis/token_filters.py.
"""
from opensearch_ray.analysis.token_filters import (
    TOKEN_FILTERS, porter_stem_filter)


def run(f, toks, pos=None):
    return f(list(toks), pos or list(range(len(toks))))


def test_keep_types():
    f = TOKEN_FILTERS["keep_types"](["<NUM>"])
    assert run(f, ["1", "quick", "2"]) == (["1", "2"], [0, 2])
    f = TOKEN_FILTERS["keep_types"](["<NUM>"], mode="exclude")
    assert run(f, ["1", "quick", "2"]) == (["quick"], [1])


def test_pattern_capture():
    f = TOKEN_FILTERS["pattern_capture"]([r"(\d+)-(?=\d)"],
                                         preserve_original=True)
    t, p = run(f, ["123-456-789"])
    assert t == ["123-456-789", "123", "456"] and p == [0, 0, 0]
    f2 = TOKEN_FILTERS["pattern_capture"]([r"([a-z]+)"],
                                          preserve_original=False)
    assert run(f2, ["abc123def"]) == (["abc", "def"], [0, 0])


def test_pattern_replace_token_filter():
    f = TOKEN_FILTERS["pattern_replace"](r"(dog)", "cat")
    assert run(f, ["foxdogs"]) == (["foxcats"], [0])


def test_stemmer_override_protects():
    f = TOKEN_FILTERS["stemmer_override"]({"running": "run"},
                                          stemmer=porter_stem_filter)
    assert run(f, ["running", "jumping"]) == (["run", "jump"], [0, 1])
    # overridden token skips the stemmer entirely
    f2 = TOKEN_FILTERS["stemmer_override"]({"jumping": "jumping"},
                                           stemmer=porter_stem_filter)
    assert run(f2, ["jumping"]) == (["jumping"], [0])


def test_condition_and_predicate():
    cond = TOKEN_FILTERS["condition"](lambda t: len(t) < 5,
                                      [TOKEN_FILTERS["uppercase"]])
    assert run(cond, ["the", "quicker", "fox"]) == \
        (["THE", "quicker", "FOX"], [0, 1, 2])
    pred = TOKEN_FILTERS["predicate_token_filter"](lambda t: t != "no")
    assert run(pred, ["yes", "no"]) == (["yes"], [0])


def test_cjk_width():
    f = TOKEN_FILTERS["cjk_width"]
    assert run(f, ["ＡＢＣ１２３"]) == (["ABC123"], [0])
    assert run(f, ["ｶﾀｶﾅ"])[0] == ["カタカナ"]


def test_delimited_payload():
    f = TOKEN_FILTERS["delimited_payload"]("|")
    assert run(f, ["the|0", "quick|10", "fox"]) == \
        (["the", "quick", "fox"], [0, 1, 2])


def test_keyword_marker():
    f = TOKEN_FILTERS["keyword_marker"](["running"],
                                        chain=[porter_stem_filter])
    assert run(f, ["running", "jumping"]) == (["running", "jump"], [0, 1])
    ident = TOKEN_FILTERS["keyword_marker"](["x"])
    assert run(ident, ["running"]) == (["running"], [0])


def test_dictionary_decompounder():
    f = TOKEN_FILTERS["dictionary_decompounder"](
        ["donau", "dampf", "schiff", "fahrt"])
    t, p = run(f, ["donaudampfschiff"])
    assert t == ["donaudampfschiff", "donau", "dampf", "schiff"]
    assert p == [0, 0, 0, 0]
    short = TOKEN_FILTERS["dictionary_decompounder"](["ab"],
                                                     min_word_size=5)
    assert run(short, ["abc"]) == (["abc"], [0])


def test_apostrophe_and_classic():
    assert run(TOKEN_FILTERS["apostrophe"], ["Istanbul'daki", "x"]) == \
        (["Istanbul", "x"], [0, 1])
    assert run(TOKEN_FILTERS["classic"], ["Quinn's", "I.B.M.", "cat"]) == \
        (["Quinn", "IBM", "cat"], [0, 1, 2])


def test_normalizations():
    assert run(TOKEN_FILTERS["arabic_normalization"], ["أحمد"])[0] == \
        ["احمد"]
    assert run(TOKEN_FILTERS["persian_normalization"], ["كتابي"])[0] == \
        ["کتابی"]
    assert run(TOKEN_FILTERS["german_normalization"],
               ["weißbier", "flüße", "quelle"])[0] == \
        ["weissbier", "flusse", "quelle"]
    assert run(TOKEN_FILTERS["scandinavian_folding"], ["räksmörgås"])[0] == \
        ["raksmorgas"]
    assert run(TOKEN_FILTERS["scandinavian_normalization"],
               ["graes", "roed"])[0] == ["græs", "rød"]
    assert run(TOKEN_FILTERS["hindi_normalization"], ["क़िला"])[0] == \
        ["किला"]


def test_flatten_graph_and_remove_duplicates():
    assert run(TOKEN_FILTERS["flatten_graph"], ["a", "b"]) == \
        (["a", "b"], [0, 1])
    f = TOKEN_FILTERS["remove_duplicates"]
    assert f(["ny", "ny", "york"], [0, 0, 1]) == (["ny", "york"], [0, 1])
    # same token at DIFFERENT positions survives
    assert f(["a", "a"], [0, 1]) == (["a", "a"], [0, 1])


def test_lowercase_lang():
    tr = TOKEN_FILTERS["lowercase_lang"]("turkish")
    assert run(tr, ["Iİx"])[0] == ["ıix"]
    gr = TOKEN_FILTERS["lowercase_lang"]("greek")
    assert run(gr, ["ΟΔΟΣ"])[0] == ["οδοσ"]
    default = TOKEN_FILTERS["lowercase_lang"]()
    assert run(default, ["ABC"])[0] == ["abc"]


# ---------------------------------------------------- moving_avg models

def test_moving_avg_models():
    import numpy as np
    import pandas as pd
    from opensearch_ray.aggs.pipeline import moving_avg_model

    b = pd.DataFrame({"key": range(6), "v": [1.0, 2, 3, 4, 5, 6]})
    simple = moving_avg_model(b, "v", window=3, model="simple")
    assert simple["moving_avg"].tolist() == [1.0, 1.5, 2.0, 3.0, 4.0, 5.0]
    lin = moving_avg_model(b, "v", window=3, model="linear")
    # window [2,3,4]: (2*1+3*2+4*3)/6 = 20/6
    assert abs(lin["moving_avg"][3] - 20 / 6) < 1e-12
    ew = moving_avg_model(b, "v", window=3, model="ewma", alpha=0.5)
    # [2,3,4]: ((2*.5... avg=2 -> 3*.5+2*.5=2.5 -> 4*.5+2.5*.5=3.25
    assert abs(ew["moving_avg"][3] - 3.25) < 1e-12
    # holt on an exactly linear series forecasts the NEXT point exactly
    ho = moving_avg_model(b, "v", window=4, model="holt",
                          alpha=0.4, beta=0.2)
    assert abs(ho["moving_avg"][5] - 7.0) < 1e-9
    # holt_winters additive on a pure periodic series forecasts the next
    # seasonal value exactly (gamma fixed point)
    per = [10.0, 20.0, 30.0] * 4
    bp = pd.DataFrame({"v": per})
    hw = moving_avg_model(bp, "v", window=12, model="holt_winters",
                          alpha=0.3, beta=0.1, gamma=0.3, period=3)
    assert abs(hw["moving_avg"][11] - 10.0) < 1e-6  # next = season slot 0
    # short window falls back to holt (reference throws; we degrade)
    hw2 = moving_avg_model(b, "v", window=3, model="holt_winters", period=3)
    assert np.isfinite(hw2["moving_avg"]).all()


# ------------------------------------------------ geo_shape shape docs

def test_geo_shape_docs_geometries():
    import json
    import pyarrow as pa
    import ray
    from opensearch_ray.aggs.geo import geo_shape_docs_filter

    shapes = {
        "tri_in": {"type": "Polygon",
                   "coordinates": [[[1, 1], [3, 1], [2, 3], [1, 1]]]},
        "tri_cross": {"type": "Polygon",
                      "coordinates": [[[8, 8], [14, 8], [11, 14], [8, 8]]]},
        "tri_out": {"type": "Polygon",
                    "coordinates": [[[30, 30], [32, 30], [31, 32],
                                     [30, 30]]]},
        "big_box": {"type": "Polygon",
                    "coordinates": [[[-5, -5], [15, -5], [15, 15],
                                     [-5, 15], [-5, -5]]]},
        "line_cross": {"type": "LineString",
                       "coordinates": [[-5, 5], [25, 5]]},
        "line_in": {"type": "LineString", "coordinates": [[1, 1], [4, 4]]},
        "pt_in": {"type": "Point", "coordinates": [2, 2]},
        "pt_out": {"type": "Point", "coordinates": [40, 40]},
    }
    t = pa.table({"id": pa.array(list(shapes)),
                  "shape": pa.array([json.dumps(v)
                                     for v in shapes.values()])})
    ds = ray.data.from_arrow(t)
    q = {"type": "envelope", "coordinates": [[0.0, 10.0], [10.0, 0.0]]}

    def ids(rel):
        return sorted(geo_shape_docs_filter(ds, "shape", q, rel)
                      .to_pandas()["id"])

    assert ids("intersects") == sorted(
        ["tri_in", "tri_cross", "big_box", "line_cross", "line_in",
         "pt_in"])
    assert ids("within") == sorted(["tri_in", "line_in", "pt_in"])
    assert ids("contains") == ["big_box"]
    assert ids("disjoint") == sorted(["tri_out", "pt_out"])


# ------------------------------------------------- round-4b filter tail

def test_language_stem_filters_delegate():
    assert run(TOKEN_FILTERS["german_stem"], ["häusern"])[0] == \
        run(TOKEN_FILTERS["stemmer"]("german"), ["häusern"])[0]
    assert run(TOKEN_FILTERS["french_stem"], ["chevaux"])[0] == \
        run(TOKEN_FILTERS["stemmer"]("french"), ["chevaux"])[0]
    for name in ("arabic_stem", "brazilian_stem", "czech_stem",
                 "dutch_stem", "russian_stem"):
        t, p = run(TOKEN_FILTERS[name], ["abc"])
        assert p == [0] and len(t) == 1


def test_serbian_normalization():
    f = TOKEN_FILTERS["serbian_normalization"]
    assert run(f, ["ђак"]) == (["djak"], [0])          # Cyrillic -> bald
    assert run(f, ["džak", "čaša"])[0] == ["dzak", "casa"]
    assert run(f, ["šuma"])[0] == ["suma"]


def test_sorani_normalization():
    f = TOKEN_FILTERS["sorani_normalization"]
    # Arabic Kaf/Yeh fold to Keheh/Farsi Yeh; final Heh -> Ae
    assert run(f, ["كتيب"])[0] == ["کتیب"]
    assert run(f, ["ماله"])[0] == ["مالە"]
    # tatweel stripped
    assert run(f, ["كـتيب"])[0] == ["کتیب"]


def test_bengali_indic_normalization():
    # nukta forms fold to the base letter (split AND precomposed RRA)
    f = TOKEN_FILTERS["bengali_normalization"]
    assert run(f, ["\u09a1\u09bc"])[0] == ["\u09a1"]
    assert run(f, ["\u09dc"])[0] == ["\u09a1"]
    # indic: split nukta form composes canonically (NFC:
    # U+0915 + U+093C -> U+0958 QA)
    g = TOKEN_FILTERS["indic_normalization"]
    assert run(g, ["\u0915\u093c"])[0] == ["\u0958"]


def test_keyword_repeat_and_remove_duplicates():
    t, p = run(TOKEN_FILTERS["keyword_repeat"], ["dogs", "ran"])
    assert t == ["dogs", "dogs", "ran", "ran"] and p == [0, 0, 1, 1]
    # the reference pipeline shape: keyword_repeat -> stemmer -> dedup
    f = TOKEN_FILTERS["keyword_repeat_with"]([porter_stem_filter])
    t, p = run(f, ["dogs", "run"])
    assert t == ["dogs", "dog", "run"] and p == [0, 0, 1]


def test_delimited_term_freq():
    f = TOKEN_FILTERS["delimited_term_freq"]()
    t, p = run(f, ["apple|3", "pear"])
    assert t == ["apple", "apple", "apple", "pear"] and p == [0, 0, 0, 1]


def test_concatenate_graph_and_type_as_payload():
    f = TOKEN_FILTERS["concatenate_graph"]()
    assert run(f, ["the", "quick", "fox"]) == (["the quick fox"], [0])
    g = TOKEN_FILTERS["concatenate_graph"]("-")
    assert run(g, ["a", "b"]) == (["a-b"], [0])
    assert run(TOKEN_FILTERS["type_as_payload"], ["x", "y"]) == \
        (["x", "y"], [0, 1])


def test_cjk_bigram_registered():
    t, p = run(TOKEN_FILTERS["cjk_bigram"], ["日", "本", "語"], [0, 1, 2])
    assert "日本" in t and "本語" in t


def test_hyphenation_decompounder():
    """Knuth-Liang pattern hyphenation (TeX82): the canonical
    'hyphenation' example breaks hy-phen-ation; the decompounder splits
    compounds at the points (dictionary-checked and raw-segment modes)."""
    from opensearch_ray.analysis.token_filters import (_liang_points,
                                                       _parse_tex_patterns)
    pats = _parse_tex_patterns(["hy3ph", "he2n", "hena4", "hen5at", "ina",
                                "n2at", "1tio", "2io", "o2n"])
    assert _liang_points("hyphenation", pats) == [2, 6]
    f = TOKEN_FILTERS["hyphenation_decompounder"](
        ["e1t"], word_list=["kaffee", "tasse"])
    assert run(f, ["kaffeetasse"]) == \
        (["kaffeetasse", "kaffee", "tasse"], [0, 0, 0])
    # no dictionary: emit the segments between consecutive points
    g = TOKEN_FILTERS["hyphenation_decompounder"](["e1t"])
    assert run(g, ["kaffeetasse"]) == \
        (["kaffeetasse", "kaffee", "tasse"], [0, 0, 0])
    # min_word_size gates short tokens entirely
    h = TOKEN_FILTERS["hyphenation_decompounder"](["e1t"], min_word_size=20)
    assert run(h, ["kaffeetasse"]) == (["kaffeetasse"], [0])


def test_phonetic_filter_soundex_and_metaphone():
    """analysis-phonetic plugin: classic Soundex test vectors (Robert and
    Rupert share R163; Smith/Schmidt share S530); replace=False keeps the
    surface token at the same position; h/w transparency (Ashcraft=A261)."""
    from opensearch_ray.analysis.token_filters import make_phonetic_filter
    f = make_phonetic_filter("soundex")
    toks, pos = f(["robert", "rupert", "smith", "schmidt", "ashcraft",
                   "tymczak", "pfister"], list(range(7)))
    assert toks == ["R163", "R163", "S530", "S530", "A261", "T522", "P236"]
    g = make_phonetic_filter("soundex", replace=False)
    toks2, pos2 = g(["smith"], [5])
    assert toks2 == ["smith", "S530"] and pos2 == [5, 5]
    m = make_phonetic_filter("metaphone")
    mt, _ = m(["knight", "phone"], [0, 1])
    assert mt[0] == "NGT" and mt[1].startswith("FN")


def test_icu_normalizer_nfkc():
    """icu_normalizer approximation: NFKC folds compatibility forms —
    fullwidth ASCII, ligatures, circled digits — to their canonical
    text; composed/decomposed accents unify."""
    from opensearch_ray.analysis.token_filters import (
        make_icu_normalizer_filter)
    f = make_icu_normalizer_filter()
    toks, pos = f(["ｆｕｌｌｗｉｄｔｈ", "ﬁle", "café", "café", "①"],
                  list(range(5)))
    assert toks[0] == "fullwidth"
    assert toks[1] == "file"
    assert toks[2] == toks[3] == "café"
    assert toks[4] == "1"
