"""Repetition quality signals + PII redaction (textstats.repetition / pii)."""

import pandas as pd
import pytest
import ray

from opensearch_ray.textstats.pii import PII_PATTERNS, redact_pii
from opensearch_ray.textstats.repetition import repetition_stats


def _stats(texts):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"i": range(len(texts)), "text": texts}))
    return (repetition_stats(ds, "text", "i")
            .to_pandas().sort_values("i").reset_index(drop=True))


def test_repetition_values():
    out = _stats([
        "a b a b a b",          # bigrams: ab,ba,ab,ba,ab -> top 'a b' 3/5
        "x y z w",              # all unique
        "q q q q q",            # 'q q' 4/4; all trigrams dup 3/3
        "solo",                 # n<2
        "",                     # empty
    ])
    assert out.n_tokens.tolist() == [6, 4, 5, 1, 0]
    assert out.top_bigram_frac.tolist() == pytest.approx(
        [3 / 5, 1 / 3, 1.0, 0.0, 0.0])
    # doc0 trigrams: aba,bab,aba,bab -> all dup -> 4/4
    assert out.dup_trigram_frac.tolist() == pytest.approx(
        [1.0, 0.0, 1.0, 0.0, 0.0])


def test_repetition_multispace_tokens():
    out = _stats(["a  b   a  b"])  # robust to repeated whitespace
    assert out.n_tokens.iloc[0] == 4
    assert out.top_bigram_frac.iloc[0] == pytest.approx(2 / 3)


def test_pii_redaction():
    dirty = ("write bob.smith+x@corp.example.org or call (555) 123-4567 "
             "from 192.168.0.1 ssn 123-45-6789 ok 12.34 end")
    ds = ray.data.from_pandas(pd.DataFrame({"text": [dirty], "i": [0]}))
    clean = redact_pii(ds, ["text"]).to_pandas().text.iloc[0]
    assert "[EMAIL]" in clean and "bob.smith" not in clean
    assert "[PHONE]" in clean and "123-4567" not in clean
    assert "[IPV4]" in clean and "192.168.0.1" not in clean
    assert "[SSN]" in clean and "123-45-6789" not in clean
    assert "ok 12.34 end" in clean  # plain decimals survive


def test_pii_patterns_are_re2_safe():
    # every pattern must compile under Arrow's RE2 (no backrefs/lookarounds)
    import pyarrow as pa
    import pyarrow.compute as pc
    col = pa.chunked_array([["probe text"]])
    for label, pat in PII_PATTERNS.items():
        pc.replace_substring_regex(col, pattern=pat,
                                   replacement=f"[{label}]")


def test_c4_filter_thresholds(ray_session):
    """c4_filter: curly/lorem page drops + word bounds + line-shape
    ratios, vectorized — each rule keeps/drops the crafted doc."""
    import pyarrow as pa
    import ray.data as rd

    from opensearch_ray.textstats.heuristics import c4_filter, c4_signals

    good = ("This is a sensible paragraph of text that ends properly. "
            * 10).strip()
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array([
            good,                                  # 0: kept
            good + " { function() }",              # 1: curly drop
            good + " Lorem Ipsum dolor sit.",      # 2: lorem drop
            "too short.",                          # 3: < min_words
            "\n".join(["- bullet point"] * 9 + [good]),  # 4: bullets
            "\n".join([good, "to be continued..."] * 9), # 5: ellipsis
        ])})
    kept = c4_filter(rd.from_arrow(docs), min_words=50,
                     max_bullet_line_ratio=0.5,
                     max_ellipsis_line_ratio=0.3).to_pandas()
    assert kept.doc_id.tolist() == [0]
    sig = c4_signals(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
    assert bool(sig.loc[1, "has_curly"]) and bool(sig.loc[2, "has_lorem"])
    assert sig.loc[4, "bullet_line_ratio"] == 0.9
    assert sig.loc[0, "punct_line_ratio"] == 1.0


def test_lm_quality_formula_and_unseen(ray_session):
    """Char-trigram LM: scores match the hand-computed smoothed formula;
    unseen text scores via the zero-count smoothing path; <3-char docs
    are NaN."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from opensearch_ray.textstats.lm_quality import (
        lm_quality_scores, train_char_trigram_model)

    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": pa.array(["ababa", "abcab", "xy"])})
    ds = rd.from_arrow(docs)
    out = lm_quality_scores(ds).to_pandas().set_index("doc_id")

    # model: trigrams of "ababa" (aba, bab, aba) + "abcab" (abc, bca, cab)
    c3 = {"aba": 2, "bab": 1, "abc": 1, "bca": 1, "cab": 1}
    # contexts = trigram PREFIX counts (ba appears as a prefix once —
    # "bab"; the final "ba" of ababa starts no trigram)
    c2 = {"ab": 3, "ba": 1, "bc": 1, "ca": 1}
    v3 = len(c3)

    def score(text):
        tris = [text[i:i + 3] for i in range(len(text) - 2)]
        return sum(math.log((c3.get(t, 0) + 1)
                            / (c2.get(t[:2], 0) + v3)) for t in tris) \
            / len(tris)

    assert out.loc[0, "lm_score"] == pytest.approx(score("ababa"))
    assert out.loc[1, "lm_score"] == pytest.approx(score("abcab"))
    assert pd.isna(out.loc[2, "lm_score"])

    # scoring foreign text against a FIXED model: unseen trigrams hit the
    # (0 + 1) / (0 + V3) smoothing floor, not a crash
    model = train_char_trigram_model(ds)
    foreign = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["zzzzz"])}))
    got = lm_quality_scores(foreign, model_ref=model).to_pandas()
    assert got["lm_score"].iloc[0] == pytest.approx(math.log(1.0 / v3))
