"""Driver-contract sanity: entry() runs, every queries() entry runs at
sf0.001, and every oracle_sql() entry parses + matches its query's columns
via DuckDB on the same tables (full value-parity is exercised by the driver
at sf0.01 and was verified locally; here we gate on schema agreement)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(x):
    if isinstance(x, pd.DataFrame):
        return x
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    return pd.DataFrame(x)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


def test_entry_returns_rows():
    out = _to_df(E.entry())
    assert len(out) > 0
    assert {"query_id", "rank", "docid", "score", "text"} <= set(out.columns)


# Each Ray-Data query launch costs seconds; running all 43 here would take
# ~10 min. Default: a representative entry per operator family; set
# OSRAY_FULL_CONTRACT=1 for the complete sweep (the driver also runs the full
# set at sf0.01 with value-hash comparison).
_FAST_SUBSET = [
    "analyze_tokens", "bm25_topk", "bool_query", "agg_terms",
    "agg_date_histogram", "ingest_pipeline", "dedup_exact", "token_count",
    "ann_cosine_topk", "sort_page2",
]


def test_every_query_runs_and_oracle_schema_matches(sf_dir, con):
    qs = E.queries()
    sqls = E.oracle_sql()
    assert set(sqls) <= set(qs), "oracle entries must have query entries"
    full = os.environ.get("OSRAY_FULL_CONTRACT") == "1"
    names = list(qs) if full else _FAST_SUBSET
    for name in names:
        mine = _to_df(qs[name](sf_dir))
        assert mine is not None, name
        sql = sqls.get(name)
        if sql is None:
            continue
        oracle = con.sql(sql).df()
        assert sorted(mine.columns) == sorted(oracle.columns), name
        assert len(mine) == len(oracle), name


def test_queries_cover_survey_families():
    names = set(E.queries())
    # every SURVEY §2 family is represented
    assert any(n.startswith("analyze") for n in names)          # analysis
    assert any(n.startswith("bm25") for n in names)             # query/topk
    assert any(n.startswith("agg_") for n in names)             # aggregations
    assert any(n.startswith("ingest") for n in names)           # ingest
    assert {"dedup_exact", "minhash_pairs", "simhash_pairs",
            "embedding_dedup"} <= names                          # dedup
    assert {"ann_cosine_topk", "ann_lsh_topk"} <= names          # similarity
    assert {"token_count", "quality_scores", "fingerprint",
            "langid"} <= names                                   # textstats
    assert "multimodal_features" in names                        # multimodal
    assert "transcript_flagship" in names                        # flagship
