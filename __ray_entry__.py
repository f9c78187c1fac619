"""Driver contract for the Ray-Data-native OpenSearch-capability engine.

``entry()``      — flagship pipeline: build an inverted index over a
                   deterministic transcript corpus, run the reference query
                   set, return (query, rank, docid, score, text) rows.
``queries()``    — one callable per implemented operator (SURVEY.md §2 +
                   training-data extras); each takes ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible entry
                   (column names match exactly). Entries without SQL get the
                   driver's rows-only check.

Ray is initialised by the DRIVER before importing this module — nothing here
calls ray.init/shutdown.

BM25-vs-SQL precision note: the engine's Lucene-identical scoring is float32
(verified bit-exact against the in-repo brute-force oracle in tests/); SQL
runs in float64, so the BM25 oracle entries run the engine in its float64
mode and round scores to 4 decimals on both sides. Everything structural
(tokenization, stopwords, norm quantization via the SmallFloat table, df/ttf,
doc sets, ranking) is identical between the two.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


# --------------------------------------------------------------------- utils

def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


def _stop_sql() -> str:
    from opensearch_ray.analysis import ENGLISH_STOP_WORDS
    return "(" + ",".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS)) + ")"


def _norm_values_sql() -> str:
    """VALUES list of the 256 SmallFloat-decoded lengths (norm quantization)."""
    from opensearch_ray.index.norms import NORM_LENGTH_TABLE
    return ",".join(f"({int(v)})" for v in np.unique(NORM_LENGTH_TABLE))


def _doc_index(sf_dir: str) -> str:
    """Build (once, cached in /tmp) the inverted index over `documents`."""
    from opensearch_ray.index.build import build_index

    # cache key includes the index format version so stale /tmp indexes from
    # older code revisions are never mixed with newer readers
    from opensearch_ray import __version__
    key = hashlib.md5(f"{sf_dir}:{__version__}:v2".encode()).hexdigest()[:10]
    idx = f"/tmp/osray_docidx_{key}"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_index(
            os.path.join(sf_dir, "documents.parquet"), idx,
            analyzer="transcript", text_col="text", sort_cols=("doc_id",),
            num_buckets=8,
        )
    return idx


def _doc_index_derived(sf_dir: str) -> str:
    """Index over `documents` + two DERIVED doc-values columns exercising
    exists / terms_set: ``opt_source`` (null when n_chars < 300 — the
    missing-value case exists() must exclude) and ``required_matches``
    ((doc_id % 3) + 1 — the per-doc minimum_should_match field)."""
    from opensearch_ray.index.build import build_index
    from opensearch_ray import __version__
    key = hashlib.md5(f"{sf_dir}:{__version__}:drv1".encode()).hexdigest()[:10]
    root = f"/tmp/osray_docidx_drv_{key}"
    idx = os.path.join(root, "idx")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        corpus = os.path.join(root, "corpus")
        os.makedirs(corpus, exist_ok=True)

        def derive(t: pa.Table) -> pa.Table:
            nchars = t.column("n_chars").to_numpy(zero_copy_only=False)
            did = t.column("doc_id").to_numpy(zero_copy_only=False)
            src = t.column("source").to_pylist()
            opt = [s if n >= 300 else None for s, n in zip(src, nchars)]
            t = t.append_column("opt_source", pa.array(opt, pa.string()))
            return t.append_column(
                "required_matches", pa.array((did % 3 + 1).astype(np.int64)))

        tbl = (_read(sf_dir, "documents")
               .map_batches(derive, batch_format="pyarrow")
               .to_arrow_refs())
        import ray as _ray
        import pyarrow.parquet as _pq
        full = pa.concat_tables(_ray.get(tbl)).sort_by("doc_id")
        _pq.write_table(full, os.path.join(corpus, "part-0.parquet"))
        build_index(corpus, idx, analyzer="transcript", text_col="text",
                    sort_cols=("doc_id",), num_buckets=4)
    return idx


def _searcher(sf_dir: str, float64: bool = True):
    from opensearch_ray.search import Searcher
    return Searcher(_doc_index(sf_dir),
                    dtype=np.float64 if float64 else np.float32)


def _explode_tokens(sf_dir: str) -> ray.data.Dataset:
    """documents -> (doc_id, token) rows via the transcript analyzer."""
    from opensearch_ray.analysis.analyzer import analyze_batch

    def explode(t: pa.Table) -> pa.Table:
        t = analyze_batch(t, analyzer="transcript")
        toks = t.column("tokens").combine_chunks() if isinstance(
            t.column("tokens"), pa.ChunkedArray) else t.column("tokens")
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        n_per = np.diff(offs)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, n_per)),
            "token": toks.flatten(),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")


_BM25_Q = "hash join stream"          # the fixed oracle query
_BM25_SQL_TEMPLATE = """
WITH norm_vals(v) AS (VALUES {NORMS}),
tok AS (
  SELECT d.doc_id, t.tok AS token
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND t.tok NOT IN {STOP}
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
consts AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
dlq AS (
  SELECT dl.doc_id,
         (SELECT max(v) FROM norm_vals WHERE v <= dl.dl) AS dl_q
  FROM dl
),
qterms(term, boost) AS (VALUES {QTERMS}),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY token, doc_id),
scored AS (
  SELECT tf.doc_id,
         SUM(qt.boost * ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (1.2 + 1.0) * tf.tf
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlq.dl_q / c.avgdl))) AS score
  FROM qterms qt
  JOIN df  ON df.token = qt.term
  JOIN tf  ON tf.token = qt.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN consts c
  GROUP BY tf.doc_id
)
"""


def _bm25_sql(body: str, query_terms=None) -> str:
    terms = query_terms or _BM25_Q.split()
    from collections import Counter
    mult = Counter(terms)
    qvals = ",".join(f"('{t}', {float(m)})" for t, m in mult.items())
    return (_BM25_SQL_TEMPLATE
            .replace("{NORMS}", _norm_values_sql())
            .replace("{STOP}", _stop_sql())
            .replace("{QTERMS}", qvals) + body)


_SIM_SQL_TEMPLATE = """
WITH norm_vals(v) AS (VALUES {NORMS}),
tok AS (
  SELECT d.doc_id, t.tok AS token
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND t.tok NOT IN {STOP}
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
consts AS (SELECT (SELECT CAST(sum(dl) AS DOUBLE) FROM dl) AS tot,
                  (SELECT CAST(count(*) AS DOUBLE) FROM documents)
                    AS n_docs),
dlq AS (
  SELECT dl.doc_id,
         CAST((SELECT max(v) FROM norm_vals WHERE v <= dl.dl) AS DOUBLE)
           AS dl_q
  FROM dl
),
qterms(term, boost) AS (VALUES {QTERMS}),
ttf AS (SELECT token, CAST(count(*) AS DOUBLE) AS ttf FROM tok
        GROUP BY token),
df AS (SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tok
       GROUP BY token),
tf AS (SELECT token, doc_id, CAST(count(*) AS DOUBLE) AS tf FROM tok
       GROUP BY token, doc_id),
scored AS (
  SELECT tf.doc_id, SUM({FORMULA}) AS score
  FROM qterms qt
  JOIN ttf ON ttf.token = qt.term
  JOIN df  ON df.token = qt.term
  JOIN tf  ON tf.token = qt.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN consts c
  GROUP BY tf.doc_id
)
"""

_SIM_FORMULAS = {
    # Lucene formula mirrors of search/similarity.py (float64 op order kept):
    # p = (ttf+1)/(tot+1), dl = 1-byte-quantized doc length.
    "boolean": "qt.boost",
    "lm_dirichlet": (
        "greatest(qt.boost * ("
        "ln(1.0 + tf.tf / (2000.0 * ((ttf.ttf + 1.0) / (c.tot + 1.0))))"
        " + ln(2000.0 / (dlq.dl_q + 2000.0))), 0.0)"),
    "lm_jelinek_mercer": (
        "greatest(qt.boost * ln(1.0 + ((1.0 - 0.1) * tf.tf / dlq.dl_q)"
        " / (0.1 * ((ttf.ttf + 1.0) / (c.tot + 1.0)))), 0.0)"),
    "dfi": (
        "CASE WHEN tf.tf > (ttf.ttf + 1.0) * dlq.dl_q / (c.tot + 1.0)"
        " THEN qt.boost * log2((tf.tf - (ttf.ttf + 1.0) * dlq.dl_q"
        " / (c.tot + 1.0)) / sqrt((ttf.ttf + 1.0) * dlq.dl_q"
        " / (c.tot + 1.0)) + 1.0) ELSE 0.0 END"),
    # the reference docs' canonical scripted-similarity example:
    # boost * sqrt(tf) * (ln((docCount+1)/(docFreq+1)) + 1) / sqrt(dl)
    "scripted": (
        "qt.boost * sqrt(tf.tf)"
        " * (ln((c.n_docs + 1.0) / (df.df + 1.0)) + 1.0)"
        " * (1.0 / sqrt(dlq.dl_q))"),
}


def _sim_sql(similarity: str, body: str, query_terms=None) -> str:
    terms = query_terms or _BM25_Q.split()
    from collections import Counter
    mult = Counter(terms)
    qvals = ",".join(f"('{t}', {float(m)})" for t, m in mult.items())
    return (_SIM_SQL_TEMPLATE
            .replace("{NORMS}", _norm_values_sql())
            .replace("{STOP}", _stop_sql())
            .replace("{QTERMS}", qvals)
            .replace("{FORMULA}", _SIM_FORMULAS[similarity]) + body)


_RANKEVAL_SQL_HEAD = """
WITH norm_vals(v) AS (VALUES {NORMS}),
tok AS (
  SELECT d.doc_id, t.tok AS token
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND t.tok NOT IN {STOP}
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
consts AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
dlq AS (
  SELECT dl.doc_id,
         (SELECT max(v) FROM norm_vals WHERE v <= dl.dl) AS dl_q
  FROM dl
),
qterms(query_id, term) AS (VALUES
  ('q_hash','hash'), ('q_hash','join'), ('q_ws','window'), ('q_ws','sort')),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY token, doc_id),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         SUM(ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (1.2 + 1.0) * tf.tf
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlq.dl_q / c.avgdl)))
           AS score
  FROM qterms qt
  JOIN df  ON df.token = qt.term
  JOIN tf  ON tf.token = qt.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN consts c
  GROUP BY qt.query_id, tf.doc_id
),
top AS (
  SELECT query_id, doc_id, rn FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rn
    FROM scored) WHERE rn <= 10
),
occ AS (SELECT DISTINCT doc_id, token FROM tok),
rated AS (
  SELECT 'q_hash' AS query_id, doc_id,
         CASE WHEN bool_or(token='hash') AND bool_or(token='join') THEN 2
              WHEN bool_or(token='hash') THEN 1 ELSE 0 END AS rating
  FROM occ WHERE token IN ('hash','join') GROUP BY doc_id
  UNION ALL
  SELECT 'q_ws', doc_id,
         CASE WHEN bool_or(token='window') AND bool_or(token='sort') THEN 2
              WHEN bool_or(token='window') THEN 1 ELSE 0 END
  FROM occ WHERE token IN ('window','sort') GROUP BY doc_id
)
"""


def _rankeval_sql(metric_body: str) -> str:
    """Multi-query BM25 ranking + data-derived graded ratings (the
    _rankeval_requests contract), plus a metric-specific tail."""
    return (_RANKEVAL_SQL_HEAD
            .replace("{NORMS}", _norm_values_sql())
            .replace("{STOP}", _stop_sql()) + metric_body)


def _sayt_sql() -> str:
    """DuckDB oracle for multi_match bool_prefix 'hash join qu' over a
    search_as_you_type field (base analyzer = standard, max_shingle_size=3).

    Per-field clause sum (BOOL_PREFIX tie_breaker=1.0):
      root:  BM25('hash') + BM25('join')        + prefix 'qu'
      2gram: BM25('hash join')                  + prefix 'join qu'
      3gram: (no complete shingles)             + prefix 'hash join qu'
    Prefix clauses are TermQueries on ._index_prefix (omitNorms =>
    idf * (k1+1) * tf/(tf+k1), no length norm); its token stream is the
    trailing-padded 3-shingle strings, so tf(prefix) = #positions whose
    padded shingle starts with the prefix."""
    NORMS = _norm_values_sql()

    def field_bm25(fid, stream, terms):
        tlist = ",".join(f"'{t}'" for t in terms)
        return f"""
dl{fid} AS (SELECT doc_id, count(*) AS dl FROM {stream} GROUP BY doc_id),
avg{fid} AS (SELECT (SELECT CAST(coalesce(sum(dl), 0) AS DOUBLE) FROM dl{fid})
                    / c.n AS avgdl FROM consts c),
dlq{fid} AS (SELECT doc_id, (SELECT max(v) FROM norm_vals WHERE v <= dl)
                    AS dlq FROM dl{fid}),
df{fid} AS (SELECT tok, count(DISTINCT doc_id) AS df FROM {stream}
            WHERE tok IN ({tlist}) GROUP BY tok),
tf{fid} AS (SELECT tok, doc_id, count(*) AS tf FROM {stream}
            WHERE tok IN ({tlist}) GROUP BY tok, doc_id),
sc{fid} AS (SELECT tf{fid}.doc_id,
                   sum(ln(1 + (c.n - df{fid}.df + 0.5) / (df{fid}.df + 0.5))
                       * 2.2 * tf{fid}.tf
                       / (tf{fid}.tf + 1.2 * (1 - 0.75 + 0.75 * dlq{fid}.dlq
                                              / a.avgdl))) AS score
            FROM tf{fid} JOIN df{fid} USING (tok)
            JOIN dlq{fid} ON dlq{fid}.doc_id = tf{fid}.doc_id
            CROSS JOIN consts c CROSS JOIN avg{fid} a
            GROUP BY tf{fid}.doc_id)"""

    def prefix_clause(pid, value):
        return f"""
p{pid} AS (SELECT doc_id, count(*) AS tf FROM pf
           WHERE starts_with(s, '{value}') GROUP BY doc_id),
dfp{pid} AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM p{pid}),
scp{pid} AS (SELECT doc_id, ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
                    * 2.2 * tf / (tf + 1.2) AS score
             FROM p{pid} CROSS JOIN dfp{pid} d CROSS JOIN consts c)"""

    return f"""
WITH norm_vals(v) AS (VALUES {NORMS}),
base AS (SELECT doc_id, text FROM documents),
consts AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM base) AS n),
tok AS (SELECT doc_id, u.tok AS tok, u.p AS p FROM (
  SELECT doc_id, unnest(list_transform(
           list_filter(string_split(text, ' '), x -> x <> ''),
           (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
  FROM base)),
tok2 AS (SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w AS tok, p FROM tok
         WINDOW w AS (PARTITION BY doc_id ORDER BY p)
         QUALIFY lead(tok, 1) OVER w IS NOT NULL),
pf AS (SELECT doc_id,
              tok || ' ' || coalesce(lead(tok, 1) OVER w, '') || ' ' ||
              coalesce(lead(tok, 2) OVER w, '') AS s
       FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
{field_bm25(1, 'tok', ['hash', 'join'])},
{field_bm25(2, 'tok2', ['hash join'])},
{prefix_clause(1, 'qu')},
{prefix_clause(2, 'join qu')},
{prefix_clause(3, 'hash join qu')},
clauses AS (
  SELECT doc_id, score FROM sc1 UNION ALL
  SELECT doc_id, score FROM sc2 UNION ALL
  SELECT doc_id, score FROM scp1 UNION ALL
  SELECT doc_id, score FROM scp2 UNION ALL
  SELECT doc_id, score FROM scp3),
tot AS (SELECT doc_id, sum(score) AS score FROM clauses GROUP BY doc_id)
SELECT doc_id, printf('%.4f', score) AS score
FROM tot ORDER BY tot.score DESC, doc_id LIMIT 10
"""


def _multi_match_sql() -> str:
    """DuckDB oracle for multi_match best_fields over title^2/body: per-field
    BM25 (own dl/avgdl/df per field, shared N and norm table), dis_max
    combine with tie_breaker=0."""
    STOP = _stop_sql()
    from collections import Counter
    mult = Counter(_BM25_Q.split())
    qvals = ",".join(f"('{t}', {float(m)})" for t, m in mult.items())

    def field_cte(name, src_expr):
        return f"""
tok_{name} AS (
  SELECT b.doc_id, t.tok AS token
  FROM base b, unnest(string_split({src_expr}, ' ')) AS t(tok)
  WHERE t.tok <> '' AND t.tok NOT IN {STOP}
),
dl_{name} AS (SELECT doc_id, count(*) AS dl FROM tok_{name} GROUP BY doc_id),
avg_{name} AS (
  SELECT (SELECT CAST(coalesce(sum(dl), 0) AS DOUBLE) FROM dl_{name})
         / (SELECT count(*) FROM base) AS avgdl),
dlq_{name} AS (
  SELECT dl.doc_id,
         (SELECT max(v) FROM norm_vals WHERE v <= dl.dl) AS dl_q
  FROM dl_{name} dl),
df_{name} AS (SELECT token, count(DISTINCT doc_id) AS df
              FROM tok_{name} GROUP BY token),
tf_{name} AS (SELECT token, doc_id, count(*) AS tf
              FROM tok_{name} GROUP BY token, doc_id),
scored_{name} AS (
  SELECT tf.doc_id,
         SUM(qt.boost * ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (1.2 + 1.0) * tf.tf
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlq.dl_q / a.avgdl))) AS score
  FROM qterms qt
  JOIN df_{name} df ON df.token = qt.term
  JOIN tf_{name} tf ON tf.token = qt.term
  JOIN dlq_{name} dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN consts c CROSS JOIN avg_{name} a
  GROUP BY tf.doc_id
)"""

    return f"""
WITH norm_vals(v) AS (VALUES {_norm_values_sql()}),
base AS (
  SELECT doc_id, text AS body,
         array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')
           AS title
  FROM documents),
consts AS (SELECT (SELECT count(*) FROM base) AS n_docs),
qterms(term, boost) AS (VALUES {qvals}),
{field_cte("t", "b.title")},
{field_cte("b", "b.body")},
combined AS (
  SELECT coalesce(st.doc_id, sb.doc_id) AS doc_id,
         greatest(coalesce(2.0 * st.score, 0.0),
                  coalesce(sb.score, 0.0)) AS score
  FROM scored_t st FULL OUTER JOIN scored_b sb ON st.doc_id = sb.doc_id)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       printf('%.4f', score) AS score
FROM combined ORDER BY combined.score DESC, doc_id LIMIT 10
"""


def _multi_match_cross_sql() -> str:
    """DuckDB oracle for multi_match cross_fields over title^2/body:
    per term the df blends to the MAX across fields, each field scores
    with the blended idf and its OWN tf/dl/avgdl, the per-term score is
    the max field contribution, terms sum per doc."""
    STOP = _stop_sql()
    from collections import Counter
    mult = Counter(_BM25_Q.split())
    qvals = ",".join(f"('{t}', {float(m)})" for t, m in mult.items())

    def field_ctes(name, src_expr):
        return f"""
tok_{name} AS (
  SELECT b.doc_id, t.tok AS token
  FROM base b, unnest(string_split({src_expr}, ' ')) AS t(tok)
  WHERE t.tok <> '' AND t.tok NOT IN {STOP}
),
dl_{name} AS (SELECT doc_id, count(*) AS dl FROM tok_{name} GROUP BY doc_id),
avg_{name} AS (
  SELECT (SELECT CAST(coalesce(sum(dl), 0) AS DOUBLE) FROM dl_{name})
         / (SELECT count(*) FROM base) AS avgdl),
dlq_{name} AS (
  SELECT dl.doc_id,
         (SELECT max(v) FROM norm_vals WHERE v <= dl.dl) AS dl_q
  FROM dl_{name} dl),
df_{name} AS (SELECT token, count(DISTINCT doc_id) AS df
              FROM tok_{name} GROUP BY token),
tf_{name} AS (SELECT token, doc_id, count(*) AS tf
              FROM tok_{name} GROUP BY token, doc_id)"""

    def contrib(name, boost):
        return f"""
con_{name} AS (
  SELECT tf.token, tf.doc_id,
         {boost} * ln(1 + (c.n_docs - bl.df + 0.5) / (bl.df + 0.5))
         * (1.2 + 1.0) * tf.tf
         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlq.dl_q / a.avgdl)) AS con
  FROM tf_{name} tf
  JOIN blend bl ON bl.term = tf.token
  JOIN dlq_{name} dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN consts c CROSS JOIN avg_{name} a)"""

    return f"""
WITH norm_vals(v) AS (VALUES {_norm_values_sql()}),
base AS (
  SELECT doc_id, text AS body,
         array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')
           AS title
  FROM documents),
consts AS (SELECT (SELECT count(*) FROM base) AS n_docs),
qterms(term, m) AS (VALUES {qvals}),
{field_ctes("t", "b.title")},
{field_ctes("b", "b.body")},
blend AS (
  SELECT qt.term,
         greatest(coalesce(dft.df, 0), coalesce(dfb.df, 0)) AS df
  FROM qterms qt
  LEFT JOIN df_t dft ON dft.token = qt.term
  LEFT JOIN df_b dfb ON dfb.token = qt.term
  WHERE greatest(coalesce(dft.df, 0), coalesce(dfb.df, 0)) > 0),
{contrib("t", 2.0)},
{contrib("b", 1.0)},
per_term AS (
  SELECT coalesce(t.token, b.token) AS term,
         coalesce(t.doc_id, b.doc_id) AS doc_id,
         greatest(coalesce(t.con, 0.0), coalesce(b.con, 0.0)) AS sc
  FROM con_t t
  FULL OUTER JOIN con_b b
    ON t.token = b.token AND t.doc_id = b.doc_id),
scored AS (
  SELECT p.doc_id, sum(qt.m * p.sc) AS score
  FROM per_term p JOIN qterms qt ON qt.term = p.term
  GROUP BY p.doc_id)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rank,
       printf('%.4f', score) AS score
FROM scored ORDER BY scored.score DESC, doc_id LIMIT 10
"""


def _multi_index_sql(boost_even: float = 1.0, boost_odd: float = 1.0) -> str:
    """DuckDB oracle for the two-index union: per-subset (doc_id parity)
    BM25 with each subset's own N/avgdl/df, merged (score desc, idx asc,
    doc_id asc) top 10. Non-unit boosts = the indices_boost variant."""
    STOP = _stop_sql()
    from collections import Counter
    mult = Counter(_BM25_Q.split())
    qvals = ",".join(f"('{t}', {float(m)})" for t, m in mult.items())

    def sub(name, parity):
        return f"""
base_{name} AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = {parity}),
tok_{name} AS (
  SELECT b.doc_id, t.tok AS token
  FROM base_{name} b, unnest(string_split(b.text, ' ')) AS t(tok)
  WHERE t.tok <> '' AND t.tok NOT IN {STOP}),
dl_{name} AS (SELECT doc_id, count(*) AS dl FROM tok_{name} GROUP BY doc_id),
c_{name} AS (
  SELECT (SELECT count(*) FROM base_{name}) AS n_docs,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl_{name})
           / (SELECT count(*) FROM base_{name}) AS avgdl),
dlq_{name} AS (
  SELECT dl.doc_id, (SELECT max(v) FROM norm_vals WHERE v <= dl.dl) AS dl_q
  FROM dl_{name} dl),
df_{name} AS (SELECT token, count(DISTINCT doc_id) AS df
              FROM tok_{name} GROUP BY token),
tf_{name} AS (SELECT token, doc_id, count(*) AS tf
              FROM tok_{name} GROUP BY token, doc_id),
scored_{name} AS (
  SELECT tf.doc_id,
         SUM(qt.boost * ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (1.2 + 1.0) * tf.tf
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlq.dl_q / c.avgdl))) AS score
  FROM qterms qt
  JOIN df_{name} df ON df.token = qt.term
  JOIN tf_{name} tf ON tf.token = qt.term
  JOIN dlq_{name} dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN c_{name} c
  GROUP BY tf.doc_id)"""

    return f"""
WITH norm_vals(v) AS (VALUES {_norm_values_sql()}),
qterms(term, boost) AS (VALUES {qvals}),
{sub("even", 0)},
{sub("odd", 1)},
unioned AS (
  SELECT 'even' AS idx, doc_id, score * {boost_even} AS score
  FROM scored_even
  UNION ALL
  SELECT 'odd' AS idx, doc_id, score * {boost_odd} AS score
  FROM scored_odd)
SELECT idx, doc_id, printf('%.4f', score) AS score
FROM unioned ORDER BY unioned.score DESC, idx, doc_id LIMIT 10
"""


def _fmt(vals, dec: int):
    """Fixed-decimal string formatting — hash-stable float comparison vs the
    SQL oracle's printf (identical correctly-rounded decimal strings)."""
    return [f"{float(v):.{dec}f}" for v in vals]


# ------------------------------------------------------------ query callables

def _q_analyze_tokens(sf_dir):
    return _explode_tokens(sf_dir)


def _q_doc_lengths(sf_dir):
    from opensearch_ray.analysis.analyzer import analyze_batch

    def dl(t: pa.Table) -> pa.Table:
        t = analyze_batch(t, analyzer="transcript")
        toks = t.column("tokens").combine_chunks() if isinstance(
            t.column("tokens"), pa.ChunkedArray) else t.column("tokens")
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t.column("doc_id"),
                         "dl": pa.array(np.diff(offs).astype(np.int64))})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        dl, batch_format="pyarrow")


def _q_term_stats(sf_dir):
    import pyarrow.parquet as pq
    idx = _doc_index(sf_dir)
    t = pq.read_table(os.path.join(idx, "term_stats"))
    return t.select(["term", "df", "ttf"]).rename_columns(["token", "df", "ttf"])


def _q_bm25_match_docs(sf_dir):
    s = _searcher(sf_dir)
    hits = s.search(_BM25_Q, k=10**9)
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_bm25_topk(sf_dir):
    s = _searcher(sf_dir)
    hits = s.search(_BM25_Q, k=10)
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_bm25_and(sf_dir):
    s = _searcher(sf_dir)
    hits = s.search("hash join", k=10**9, operator="and")
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_similarity(similarity):
    """Top-10 under an alternative similarity module (similarity.py)."""
    def run(sf_dir):
        from opensearch_ray.search.similarity import similarity_search
        hits = similarity_search(_searcher(sf_dir), _BM25_Q, k=10,
                                 similarity=similarity)
        return pd.DataFrame({
            "doc_id": [h.docid for h in hits],
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "score": _fmt([h.score for h in hits], 4),
        })
    return run


def _q_sim_scripted(sf_dir):
    """`scripted` similarity (SimilarityService.java:115 builtIn
    "scripted"): the docs' canonical example script — tf*idf/sqrt(dl) —
    as a Python callable in the provider slot."""
    from opensearch_ray.search.similarity import similarity_search

    def script(tf, dl, df, n_docs, boost, **_):
        return (boost * np.sqrt(tf)
                * (np.log((n_docs + 1.0) / (df + 1.0)) + 1.0)
                / np.sqrt(dl))

    hits = similarity_search(_searcher(sf_dir), _BM25_Q, k=10,
                             similarity="scripted", script=script)
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_term_query(sf_dir):
    s = _searcher(sf_dir)
    return pd.DataFrame({"doc_id": s.term_docs("window").astype(np.int64)})


def _q_bool_query(sf_dir):
    s = _searcher(sf_dir)
    docs = s.bool_docs(must=["hash", "join"], must_not=["merge"])
    return pd.DataFrame({"doc_id": docs.astype(np.int64)})


def _q_phrase_query(sf_dir):
    s = _searcher(sf_dir)
    docs = s.match_phrase("batch batch")
    return pd.DataFrame({"doc_id": docs.astype(np.int64)})


def _q_agg_terms(sf_dir):
    from opensearch_ray.aggs import terms_agg
    out = terms_agg(_read(sf_dir, "lineitem", ["l_returnflag"]),
                    "l_returnflag", size=10)
    return out[["l_returnflag", "doc_count"]]


def _q_agg_multi_terms(sf_dir):
    from opensearch_ray.aggs import multi_terms_agg
    return multi_terms_agg(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"]),
        ["l_returnflag", "l_linestatus"], size=10)


def _q_agg_stats(sf_dir):
    from opensearch_ray.aggs import stats_agg
    out = stats_agg(_read(sf_dir, "lineitem", ["l_quantity"]), "l_quantity")
    out["sum"] = _fmt(out["sum"], 2)
    out["avg"] = _fmt(out["avg"], 6)
    return out


def _q_agg_extended_stats(sf_dir):
    from opensearch_ray.aggs import extended_stats_agg
    out = extended_stats_agg(_read(sf_dir, "lineitem", ["l_discount"]), "l_discount")
    for c in ["sum", "sum_of_squares", "avg", "variance", "std_deviation"]:
        out[c] = _fmt(out[c], 6)
    return out[["count", "min", "max", "sum", "avg", "variance", "std_deviation", "sum_of_squares"]]


def _q_agg_value_count(sf_dir):
    from opensearch_ray.aggs import value_count_agg
    n = value_count_agg(_read(sf_dir, "orders", ["o_custkey"]), "o_custkey")
    return pd.DataFrame({"value_count": [n]})


def _q_agg_weighted_avg(sf_dir):
    from opensearch_ray.aggs import weighted_avg_agg
    v = weighted_avg_agg(_read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"]),
                         "l_extendedprice", "l_quantity")
    return pd.DataFrame({"weighted_avg": _fmt([v], 4)})


def _q_agg_cardinality(sf_dir):
    from opensearch_ray.aggs import cardinality_exact
    n = cardinality_exact(_read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey")
    return pd.DataFrame({"cardinality": [n]})


def _q_agg_date_histogram(sf_dir):
    from opensearch_ray.aggs import date_histogram_agg
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]),
                             "o_orderdate", "month", sum_col="o_totalprice")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    out["total_price"] = _fmt(out["sum_o_totalprice"], 2)
    return out[["month", "doc_count", "total_price"]]


def _q_agg_histogram(sf_dir):
    from opensearch_ray.aggs import histogram_agg
    out = histogram_agg(_read(sf_dir, "events", ["value"]), "value", 50.0)
    return out[["key", "doc_count"]]


def _q_agg_range(sf_dir):
    from opensearch_ray.aggs import range_agg
    return range_agg(_read(sf_dir, "lineitem", ["l_quantity"]),
                     "l_quantity", [(None, 10.0), (10.0, 25.0), (25.0, None)])


def _q_agg_composite(sf_dir):
    from opensearch_ray.aggs import composite_agg
    return composite_agg(_read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
                         ["o_orderstatus", "o_orderpriority"], size=100)


def _q_agg_top_hits(sf_dir):
    from opensearch_ray.aggs import top_hits_agg
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"])

    def best(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True], kind="mergesort").head(1)

    out = ds.groupby("l_returnflag").map_groups(best, batch_format="pandas").to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


def _q_scripted_metric(sf_dir):
    """scripted_metric agg (ScriptedMetricAggregationBuilder): Python
    map/combine callables standing in for Painless — per-batch partial
    (count, sum, sum of squares) over events.value, driver combine."""
    from opensearch_ray.aggs import scripted_metric_agg
    ds = _read(sf_dir, "events", ["value"])

    def map_fn(t):
        v = t.column("value").to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        return (len(v), float(v.sum()), float((v * v).sum()))

    def combine_fn(states):
        n = sum(s[0] for s in states)
        sv = sum(s[1] for s in states)
        sq = sum(s[2] for s in states)
        return pd.DataFrame({"n": pd.array([n], dtype="int64"),
                             "sum_value": _fmt(np.array([sv]), 2),
                             "sum_sq": _fmt(np.array([sq]), 2)})

    return scripted_metric_agg(ds, map_fn, combine_fn)


def _q_agg_matrix_stats(sf_dir):
    from opensearch_ray.aggs import matrix_stats_agg
    out = matrix_stats_agg(_read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"]),
                           ["l_quantity", "l_extendedprice"])
    row = out[(out.col_a == "l_quantity") & (out.col_b == "l_extendedprice")]
    return pd.DataFrame({
        "covariance": _fmt([row["covariance"].iloc[0]], 4),
        "correlation": _fmt([row["correlation"].iloc[0]], 6),
    })


def _q_agg_cumulative_sum(sf_dir):
    from opensearch_ray.aggs import date_histogram_agg, cumulative_sum
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out = cumulative_sum(out, "doc_count", out="cum_count")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    return out[["month", "doc_count", "cum_count"]]


def _q_agg_derivative(sf_dir):
    from opensearch_ray.aggs import date_histogram_agg, derivative
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out = derivative(out, "doc_count", out="deriv")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    out = out.dropna(subset=["deriv"])
    out["deriv"] = out["deriv"].astype(np.int64)
    return out[["month", "deriv"]]


def _q_sort_page2(sf_dir):
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])
    rows = ds.sort(["ts", "event_id"]).limit(40).take_all()[20:40]
    return pd.DataFrame(rows)[["event_id", "value"]]


def _q_collapse(sf_dir):
    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def best(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["value", "event_id"],
                             ascending=[False, True], kind="mergesort").head(1)

    out = ds.groupby("user_id").map_groups(best, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_function_score(sf_dir):
    """function_score field_value_factor: score = value, top 10."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    rows = ds.sort(["value", "event_id"], descending=[True, False]).limit(10).take_all()
    out = pd.DataFrame(rows)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["event_id", "value", "rank"]]


def _q_ingest_pipeline(sf_dir):
    """set/json/rename/convert/date processors over events."""
    from opensearch_ray.ingest import IngestPipeline, make_processor
    pipe = IngestPipeline([
        make_processor("json", field="props", target_field="props_obj"),
        make_processor("script", fn=lambda df: df.assign(
            k=df["props_obj"].map(lambda d: d.get("k")))),
        make_processor("convert", field="k", type_="long"),
        make_processor("uppercase", field="event_type"),
        make_processor("set", field="pipeline", value="demo"),
        make_processor("remove", field=["props", "props_obj"]),
    ])
    out = pipe.apply(_read(sf_dir, "events",
                           ["event_id", "event_type", "props"])).to_pandas()
    return out[["event_id", "event_type", "k", "pipeline"]]


def _q_ingest_grok(sf_dir):
    """grok/dissect-style extraction from a synthesized log line per event."""
    from opensearch_ray.ingest import IngestPipeline, make_processor
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def to_log(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        v = t.column("value").to_pylist()
        eid = t.column("event_id").to_pylist()
        lines = [f"evt={e} type={ty} value={val}" for e, ty, val in zip(eid, et, v)]
        return pa.table({"event_id": t.column("event_id"),
                         "line": pa.array(lines, pa.string())})

    pipe = IngestPipeline([
        make_processor("kv", field="line", field_split=" ", value_split="="),
        make_processor("convert", field="evt", type_="long"),
        make_processor("convert", field="value", type_="double"),
    ])
    out = pipe.apply(ds.map_batches(to_log, batch_format="pyarrow")).to_pandas()
    return out[["event_id", "evt", "type", "value"]]


def _q_dedup_cluster_keep_best(sf_dir):
    """Near-dup CLUSTERS with keep-best survivors: exact distinct-token
    Jaccard edges (shared-token blocking 2<=df<=100, threshold 0.5) ->
    hash-to-min connected components (Rastogi et al. ICDE'13) ->
    per-component argmax(n_chars, tie doc_id asc). Oracle: DuckDB
    recursive CTE over the identical edge definition. The MinHash
    variant (dedup_minhash_clusters) is the sketched scale path."""
    from opensearch_ray.dedup.cluster import (connected_components,
                                              keep_best, token_jaccard_edges)
    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    edges = token_jaccard_edges(docs, max_df=100, threshold=0.5)
    comp = connected_components(edges)
    kb = keep_best(docs, comp, quality_col="n_chars")
    return kb.to_pandas().sort_values("component").reset_index(drop=True)


def _q_dedup_minhash_clusters(sf_dir):
    """MinHash-LSH near-dup clusters + keep-best — the sketched scale
    path of dedup_cluster_keep_best (rows-only: LSH banding is not
    SQL-expressible)."""
    from opensearch_ray.dedup.cluster import near_dup_clusters
    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    kb = near_dup_clusters(docs, threshold=0.6)
    return kb.to_pandas().sort_values("component").reset_index(drop=True)


def _q_dedup_exact(sf_dir):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from opensearch_ray.dedup import content_hashes

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("text", as_index=False)
               .agg(doc_id=("doc_id", "min"), dup_count=("doc_id", "count")))
        return out[["doc_id", "dup_count"]]

    hashed = content_hashes(ds, "text")
    return (hashed.groupby("_content_hash")
            .map_groups(agg, batch_format="pandas").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def _q_token_count(sf_dir):
    from opensearch_ray.textstats import token_counts
    out = token_counts(_read(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    return out[["doc_id", "whitespace_tokens"]]


def _q_quality(sf_dir):
    from opensearch_ray.textstats import quality_scores
    out = quality_scores(_read(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    return out[["doc_id", "n_tokens", "stopword_ratio"]]


def _q_bulk_ndjson_source(sf_dir):
    """_bulk NDJSON source (BulkRequestParser semantics): a bulk body
    synthesized from `documents` — index every doc, overlay an update on
    doc_id%7==0, delete doc_id%11==0 — resolved per _id in line order;
    the oracle reproduces the op algebra in SQL."""
    import json as _json
    import pyarrow.parquet as _pq
    from opensearch_ray.sources import read_bulk_ndjson
    tbl = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars", "lang"])
    path = f"/tmp/osray_bulk_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}.ndjson"
    with open(path, "w") as f:
        for did, nch, lang in zip(tbl.column("doc_id").to_pylist(),
                                  tbl.column("n_chars").to_pylist(),
                                  tbl.column("lang").to_pylist()):
            f.write(_json.dumps({"index": {"_id": did}}) + "\n")
            f.write(_json.dumps({"n_chars": int(nch), "lang": lang})
                    + "\n")
            if did % 7 == 0:
                f.write(_json.dumps({"update": {"_id": did}}) + "\n")
                f.write(_json.dumps({"doc": {"n_chars": int(nch) + 1000}})
                        + "\n")
            if did % 11 == 0:
                f.write(_json.dumps({"delete": {"_id": did}}) + "\n")
    out = read_bulk_ndjson(path).to_pandas()
    out["doc_id"] = out["_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["doc_id", "n_chars", "lang"]] \
        .sort_values("doc_id").reset_index(drop=True)


def _q_analyze_custom_chain(sf_dir):
    """Inline custom analyzer chain (the `_analyze` request-body
    definition): whitespace tokenizer + lowercase + length filter over
    documents, exploded to (doc_id, token)."""
    from opensearch_ray.analysis.analyzer import analyze_batch
    spec = {"tokenizer": "whitespace",
            "filter": ["lowercase",
                       {"type": "length", "min": 3, "max": 8}]}

    def explode(t: pa.Table) -> pa.Table:
        t = analyze_batch(t, analyzer=spec)
        toks = t.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(np.repeat(
                t.column("doc_id").to_numpy(zero_copy_only=False),
                n_per)),
            "token": toks.flatten()})

    out = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "token"]).reset_index(drop=True)


def _q_lm_quality(sf_dir):
    """Char-trigram LM quality score (CCNet-shape, self-trained): per-doc
    mean Laplace-smoothed trigram log-prob over a two-pass streaming
    model — the perplexity-filter analogue with no external LM."""
    from opensearch_ray.textstats.lm_quality import lm_quality_scores
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = lm_quality_scores(ds).to_pandas()
    out = out[out["lm_score"].notna()].copy()
    out["lm_score"] = _fmt(out["lm_score"].values, 4)
    return out[["doc_id", "lm_score"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q_c4_quality_signals(sf_dir):
    """C4/Gopher heuristic shape signals (Raffel et al. JMLR'20 §2.2 +
    Gopher doc-shape rules): per-doc line/word counts and
    terminal-punct / bullet / ellipsis line ratios, one vectorized Arrow
    pass — the annotate side of textstats.heuristics.c4_filter."""
    from opensearch_ray.textstats.heuristics import c4_signals
    out = c4_signals(_read(sf_dir, "documents", ["doc_id", "text"])) \
        .to_pandas()
    for c in ("punct_line_ratio", "bullet_line_ratio",
              "ellipsis_line_ratio"):
        out[c] = _fmt(out[c].values, 4)
    out["has_curly"] = out["has_curly"].astype(bool)
    out["has_lorem"] = out["has_lorem"].astype(bool)
    return out[["doc_id", "n_lines", "n_words", "punct_line_ratio",
                "bullet_line_ratio", "ellipsis_line_ratio", "has_curly",
                "has_lorem"]].sort_values("doc_id").reset_index(drop=True)


def _q_dsir_logweight(sf_dir):
    """DSIR importance log-weights (Xie et al., NeurIPS 2023): hashed
    unigram+bigram models for target (lang='en') vs raw, per-doc
    sum of bucket log-likelihood ratios. Two bounded passes + map-only
    scoring (see textstats/dsir.py)."""
    from opensearch_ray.textstats.dsir import dsir_log_weights
    raw = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    target = raw.filter(expr="lang == 'en'")
    out = dsir_log_weights(raw, target, buckets=4096).to_pandas()
    out["dsir_logw"] = _fmt(out["dsir_logw"].values, 4)
    return out[["doc_id", "dsir_logw"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q_fingerprint(sf_dir):
    from opensearch_ray.textstats import fingerprints
    out = fingerprints(_read(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    return out[["doc_id", "fingerprint"]]


def _q_ann_brute(sf_dir):
    import pyarrow.parquet as pq
    from opensearch_ray.similarity import brute_force_topk
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]).column("embedding").to_pylist()[0]
    out = brute_force_topk(_read(sf_dir, "embeddings"), np.asarray(q, np.float64),
                           k=10, dtype=np.float64)
    out["score"] = _fmt(out["score"], 5)
    return out[["vec_id", "score", "rank"]]


def _q_hybrid_rrf(sf_dir):
    """Hybrid BM25 + kNN retrieval fused with Reciprocal Rank Fusion
    (Cormack et al. SIGIR'09, k0=60): top-10 by
    1/(60+bm25_rank) + 1/(60+cosine_rank) over depth-100 legs."""
    import pyarrow.parquet as pq
    from opensearch_ray.similarity import hybrid_rrf_search
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]) \
        .column("embedding").to_pylist()[0]
    out = hybrid_rrf_search(_searcher(sf_dir), _read(sf_dir, "embeddings"),
                            _BM25_Q, np.asarray(q, np.float64),
                            k=10, k0=60, depth=100)
    out["rrf_score"] = _fmt(out["rrf_score"], 6)
    return out[["doc_id", "rrf_score", "bm25_rank", "knn_rank", "rank"]] \
        .astype({"doc_id": np.int64, "bm25_rank": np.int64,
                 "knn_rank": np.int64}).reset_index(drop=True)


def _q_hybrid_normalized(sf_dir):
    """OpenSearch `hybrid` query fusion (neural-search normalization
    processor): min_max-normalize the BM25 and cosine depth-100 legs,
    combine with a weighted (0.7/0.3) arithmetic mean over present
    legs, top-10 (score desc, doc id asc)."""
    import pyarrow.parquet as pq
    from opensearch_ray.similarity import hybrid_normalized_search
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]) \
        .column("embedding").to_pylist()[0]
    out = hybrid_normalized_search(
        _searcher(sf_dir), _read(sf_dir, "embeddings"), _BM25_Q,
        np.asarray(q, np.float64), k=10, depth=100, technique="min_max",
        combination="arithmetic_mean", weights=(0.7, 0.3))
    for c in ("bm25_norm", "knn_norm", "score"):
        out[c] = _fmt(out[c], 5)
    return out[["doc_id", "bm25_norm", "knn_norm", "score", "rank"]] \
        .astype({"doc_id": np.int64}).reset_index(drop=True)


def _q_dedup_lines(sf_dir):
    """Line-level keep-first dedup (CCNet/RefinedWeb paragraph dedup;
    sep=' ' at test scale — the docs are single-line, so 'lines' are
    the whitespace segments; same code path as the \\n default)."""
    from opensearch_ray.dedup import line_dedup
    out = line_dedup(_read(sf_dir, "documents", ["doc_id", "text"]),
                     sep=" ").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": np.int64, "lines_removed": np.int64})


def _q_function_score_random(sf_dir):
    """function_score with a seeded random_score function
    (RandomScoreFunctionBuilder; Knuth multiplicative hash on doc id —
    SQL-reproducible): top-10 of bm25 * rand(seed=42) over the BM25
    top-100 window, boost_mode=multiply."""
    from opensearch_ray.search.features import (function_score_search,
                                                random_score_values)
    s = _searcher(sf_dir)

    def rand42(fetched):
        ids = np.asarray(fetched.column("_docid").to_pylist(), np.int64)
        return random_score_values(ids, seed=42)

    out = function_score_search(s, _BM25_Q, [rand42], k=10, window=100,
                                boost_mode="multiply")
    out["score"] = _fmt(out["score"], 5)
    return out.astype({"doc_id": np.int64}).reset_index(drop=True)


def _q_neural_sparse(sf_dir):
    """neural_sparse query (raw query_tokens mode): sparse dot product
    of {token: weight} query against a per-doc JSON feature map —
    derived deterministically from events (clicks=value, u=user_id%7);
    top-10 by 0.5*clicks + 2.0*u, (score desc, id asc)."""
    from opensearch_ray.search.features import neural_sparse_topk

    def derive(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        maps = [f'{{"clicks": {float(x)!r}, "u": {int(y) % 7}}}'
                for x, y in zip(v, u)]
        return pa.table({"event_id": t.column("event_id"),
                         "feats": pa.array(maps, pa.string())})

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"]) \
        .map_batches(derive, batch_format="pyarrow")
    out = neural_sparse_topk(ds, "feats", {"clicks": 0.5, "u": 2.0},
                             "event_id", k=10)
    out["score"] = _fmt(out["score"], 4)
    return out.astype({"event_id": np.int64}).reset_index(drop=True)


def _q_term_case_insensitive(sf_dir):
    """term query `case_insensitive` option (TermQueryBuilder:58):
    casefolded doc-values equality on `lang` ('EN' matches 'en')
    intersected with the casefolded terms-dict expansion on the text
    field ('WINDOW' -> 'window')."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    a = dsl.query_docs(s, {"term": {"lang": {
        "value": "EN", "case_insensitive": True}}})
    b = dsl.query_docs(s, {"term": {"text": {
        "value": "WINDOW", "case_insensitive": True}}})
    return pd.DataFrame({"doc_id": np.intersect1d(a, b).astype(np.int64)})


def _q_dsl_hybrid_query(sf_dir):
    """`hybrid` query through the DSL executor (neural-search
    HybridQueryBuilder + normalization-processor): two BM25 legs
    (different query texts), depth-100, min_max normalization,
    weighted (0.6/0.4) arithmetic-mean combination, top-10."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    body = {"query": {"hybrid": {
                "queries": [{"match": {"text": _BM25_Q}},
                            {"match": {"text": "sort merge batch"}}],
                "pagination_depth": 100,
                "normalization": {"technique": "min_max"},
                "combination": {"technique": "arithmetic_mean",
                                "parameters": {"weights": [0.6, 0.4]}}}},
            "size": 10}
    r = dsl.execute_search(s, body)
    r["score"] = _fmt(r["score"].values, 5)
    return r.reset_index(drop=True)


def _q_agg_ip_prefix(sf_dir):
    """ip_prefix agg (/20) over deterministic derived IPv4 strings."""
    from opensearch_ray.aggs import ip_prefix_agg

    def derive(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ips = [f"10.{int(u) % 256}.{int(e) % 256}.1"
               for u, e in zip(uid, eid)]
        return pa.table({"ip": pa.array(ips, pa.string())})

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow")
    return ip_prefix_agg(ds, "ip", 20)


# ------------------------------------------------------- rows-only callables

def _q_langid(sf_dir):
    from opensearch_ray.textstats import langid_heuristic
    out = langid_heuristic(_read(sf_dir, "documents", ["doc_id", "text", "lang"]))
    return out.to_pandas()[["doc_id", "lang", "predicted_lang"]]


def _q_minhash_pairs(sf_dir):
    from opensearch_ray.dedup import minhash_dedup_pairs
    return minhash_dedup_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                               threshold=0.5)


def _q_simhash_pairs(sf_dir):
    from opensearch_ray.dedup import simhash_dedup_pairs
    return simhash_dedup_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                               max_hamming=3)


def _q_embed_dedup(sf_dir):
    from opensearch_ray.dedup import embedding_dedup_pairs
    return embedding_dedup_pairs(_read(sf_dir, "embeddings"), threshold=0.9)


def _q_ann_lsh(sf_dir):
    import pyarrow.parquet as pq
    from opensearch_ray.similarity import lsh_topk
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]).column("embedding").to_pylist()[0]
    return lsh_topk(_read(sf_dir, "embeddings"), np.asarray(q, np.float32), k=10)


def _q_ann_hnsw(sf_dir):
    """Per-segment HNSW ANN (plugins/knn per-Lucene-segment graph model;
    Malkov & Yashunin arXiv:1603.09320). Rows-only: graph search is
    approximate by construction; recall vs brute force gated in pytest."""
    import pyarrow.parquet as pq
    import shutil
    from opensearch_ray.similarity import HnswIndex
    d = f"/tmp/osray_hnsw_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if not os.path.exists(os.path.join(d, "hnsw_meta.json")):
        shutil.rmtree(d, ignore_errors=True)
        HnswIndex.build(_read(sf_dir, "embeddings"), d, n_segments=4,
                        M=8, ef_construction=48)
    idx = HnswIndex(d)
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]
                      ).column("embedding").to_pylist()[0]
    out = idx.search(np.asarray(q, np.float32), k=10, ef_search=64)
    return out[["vec_id", "rank"]]


def _q_ann_pq(sf_dir):
    """PQ+ADC ANN: 8-byte codes per 64-dim vector, asymmetric-distance
    top-10 (rows-only; ranking is quantized, recall tested in pytest)."""
    import pyarrow.parquet as pq
    from opensearch_ray.similarity.pq import pq_encode, pq_topk, pq_train
    ds = _read(sf_dir, "embeddings")
    books = pq_train(ds, m=8, sample_size=2048)
    codes = pq_encode(ds, books)
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]
                      ).column("embedding").to_pylist()[0]
    out = pq_topk(codes, books, np.asarray(q, np.float32), k=10)
    out["score"] = _fmt(out["score"].values, 4)
    return out[["vec_id", "score", "rank"]]


def _q_ann_ivfpq(sf_dir):
    """IVF-PQ (IVFADC): coarse cells prune I/O to nprobe dirs, PQ codes
    bound memory to 8 bytes/vector — rows-only (quantized ranking)."""
    import shutil
    from opensearch_ray.similarity.ivfpq import IvfPqIndex
    import pyarrow.parquet as pq
    d = f"/tmp/osray_ivfpq_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if not os.path.exists(os.path.join(d, "ivfpq_meta.json")):
        shutil.rmtree(d, ignore_errors=True)
        IvfPqIndex.build(_read(sf_dir, "embeddings"), d, n_cells=8,
                         sample_size=2048)
    idx = IvfPqIndex(d)
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]
                      ).column("embedding").to_pylist()[0]
    out = idx.search(np.asarray(q, np.float32), k=10, nprobe=4)
    out["score"] = _fmt(out["score"].values, 4)
    return out[["vec_id", "score", "rank"]]


def _q_ann_ivf(sf_dir):
    import pyarrow.parquet as pq
    import shutil
    from opensearch_ray.similarity import IvfIndex
    d = f"/tmp/osray_ivf_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if not os.path.exists(os.path.join(d, "ivf_meta.json")):
        shutil.rmtree(d, ignore_errors=True)
        IvfIndex.build(_read(sf_dir, "embeddings"), d, n_cells=8)
    idx = IvfIndex(d)
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      filters=[("vec_id", "=", 0)]).column("embedding").to_pylist()[0]
    out = idx.search(np.asarray(q, np.float32), k=10, nprobe=3)
    return out[["vec_id", "rank"]]


def _q_cardinality_hll(sf_dir):
    from opensearch_ray.aggs import cardinality_hll
    n = cardinality_hll(_read(sf_dir, "events", ["user_id"]), "user_id")
    return pd.DataFrame({"cardinality_hll": [n]})


def _q_percentiles_tdigest(sf_dir):
    from opensearch_ray.aggs import percentiles_tdigest
    return percentiles_tdigest(_read(sf_dir, "lineitem", ["l_extendedprice"]),
                               "l_extendedprice")


def _q_multimodal(sf_dir):
    from opensearch_ray.multimodal import ImageDecodeStage, attach_fake_payloads
    tbl = attach_fake_payloads(200, seed=42)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(ImageDecodeStage, batch_size=32, batch_format="pyarrow",
                         concurrency=2).to_pandas()
    out["feat0"] = out["features"].map(lambda f: round(float(f[0]), 5))
    return out[["media_id", "feat0", "resized_w"]]


def _q_phash_dedup(sf_dir):
    """Perceptual-hash (dHash) near-dup pairs over image payloads —
    hash + band-16 LSH gate + vectorized hamming verify; decode is the
    documented deterministic fake (codec container limit), the hashing
    and bucketing machinery is real (rows-only)."""
    import pyarrow as _pa
    from opensearch_ray.multimodal.stages import (attach_fake_payloads,
                                                  phash_dedup_pairs)
    t = attach_fake_payloads(300, seed=42)
    # plant exact duplicates to guarantee pairs
    dup = t.slice(0, 10).set_column(
        0, "media_id", _pa.array(np.arange(1000, 1010, dtype=np.int64)))
    ds = ray.data.from_arrow(_pa.concat_tables([t, dup]))
    out = phash_dedup_pairs(ds, max_hamming=2)
    return out.astype({"a": np.int64, "b": np.int64,
                       "hamming": np.int64})


def _q_training_data_pipeline(sf_dir):
    import shutil
    from opensearch_ray.pipelines import prepare_training_data
    out = f"/tmp/osray_training_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(out, ignore_errors=True)
    summary = prepare_training_data(
        os.path.join(sf_dir, "documents.parquet"), out,
        min_quality=0.05, near_dup_threshold=0.8, n_shards=4)
    kept = ray.data.read_parquet(out).count() if summary["kept_rows"] else 0
    return pd.DataFrame([{**summary, "reread_rows": kept}])


def _q_transcript_flagship(sf_dir):
    from opensearch_ray.pipelines import flagship_pipeline
    return flagship_pipeline(work_dir="/tmp/osray_flagship_q", n_turns=2000,
                             n_files=4)



# ------------------------------------------------ joins / windows / features

def _q_asof_join(sf_dir):
    import pyarrow.parquet as pq
    from opensearch_ray.joins import asof_join
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    left = ev[ev["event_type"] == "purchase"][["user_id", "ts", "event_id"]]
    right = ev[ev["event_type"] == "signup"][["user_id", "ts", "value"]]
    out = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    key_col="user_id", ts_col="ts").to_pandas()
    out = out[["event_id", "value"]].sort_values("event_id").reset_index(drop=True)
    # the union's null padding floats the left key column; restore int64 so
    # the schema matches the oracle's BIGINT
    out["event_id"] = out["event_id"].astype("int64")
    return out


def _q_hash_join(sf_dir):
    import pyarrow.parquet as pq
    from opensearch_ray.joins import hash_join
    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_mktsegment"])

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "c_mktsegment"])

    joined = hash_join(orders, cust.map_batches(ren, batch_format="pyarrow"),
                       key_col="o_custkey").to_pandas()
    g = (joined.groupby("c_mktsegment")
         .agg(order_count=("o_totalprice", "size"),
              total=("o_totalprice", "sum")).reset_index())
    g["total"] = _fmt(g["total"], 2)
    return g.sort_values("c_mktsegment").reset_index(drop=True)


def _q_window_tumbling(sf_dir):
    from opensearch_ray.streaming import tumbling_window
    out = tumbling_window(_read(sf_dir, "events"), "event_type", "ts", "value", "1h")
    out["window_start"] = pd.to_datetime(out["window_start"]).dt.strftime("%Y-%m-%d %H")
    out["value_sum"] = _fmt(out["value_sum"], 2)
    return out[["event_type", "window_start", "doc_count", "value_sum"]]


def _q_window_sliding(sf_dir):
    from opensearch_ray.streaming import sliding_window
    out = sliding_window(_read(sf_dir, "events"), "event_type", "ts", "value",
                         size="2h", slide="1h")
    out["window_start"] = pd.to_datetime(out["window_start"]).dt.strftime(
        "%Y-%m-%d %H")
    out["value_sum"] = _fmt(out["value_sum"], 2)
    return out[["event_type", "window_start", "doc_count", "value_sum"]]


def _q_window_session(sf_dir):
    from opensearch_ray.streaming import session_window
    out = session_window(_read(sf_dir, "events"), "user_id", "ts", "value",
                         gap="30min")
    out["session_start"] = pd.to_datetime(out["session_start"]).dt.strftime(
        "%Y-%m-%d %H:%M:%S")
    return out[["user_id", "session_start", "doc_count"]]


def _q_collapse_bm25_by_lang(sf_dir):
    s = _searcher(sf_dir)
    from opensearch_ray.search.features import collapse_search
    out = collapse_search(s, _BM25_Q, "lang", k=10, candidate_window=10**6)
    out["score"] = _fmt(out["score"], 4)
    out = out.rename(columns={"_docid": "doc_id"})
    return out[["lang", "doc_id", "score"]]


def _q_term_suggester(sf_dir):
    s = _searcher(sf_dir)
    from opensearch_ray.search.features import term_suggest
    out = term_suggest(s, "hsah", max_edits=2, size=5)
    return out[["suggestion", "distance", "df", "rank"]]


def _q_function_score_decay(sf_dir):
    from opensearch_ray.search.features import decay_gauss, function_score_topk
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def score(t: pa.Table):
        v = t.column("value").to_numpy(zero_copy_only=False)
        return decay_gauss(v, origin=100.0, scale=50.0)

    out = function_score_topk(ds, score, id_col="event_id", k=10)
    out["score"] = _fmt(out["score"], 6)
    return out[["event_id", "score", "rank"]]


def _q_terms_lookup(sf_dir):
    import pyarrow.compute as pc
    from opensearch_ray.search.features import terms_lookup_filter
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"])
    parts = _read(sf_dir, "part", ["p_partkey", "p_size"])
    out = terms_lookup_filter(
        li, "l_partkey", parts, "p_partkey",
        lambda t: pc.greater(t.column("p_size"), 40))
    return out.to_pandas().sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def _q_search_after(sf_dir):
    s = _searcher(sf_dir)
    from opensearch_ray.search.features import search_after_page
    p1 = s.search(_BM25_Q, k=10)
    p2 = search_after_page(s, _BM25_Q, page_size=10,
                           after=(p1[-1].score, p1[-1].docid))
    return pd.DataFrame({
        "doc_id": [h.docid for h in p2],
        "rank": np.arange(11, 11 + len(p2), dtype=np.int64),
        "score": _fmt([h.score for h in p2], 4),
    })


def _q_agg_moving_avg(sf_dir):
    from opensearch_ray.aggs import date_histogram_agg, moving_fn
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out = moving_fn(out, "doc_count", window=3, out="mov_avg")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    out["mov_avg"] = _fmt(out["mov_avg"], 4)
    return out[["month", "doc_count", "mov_avg"]]


def _q_geo_shape_docs(sf_dir):
    """geo_shape over SHAPE-VALUED docs: each event becomes a GeoJSON box
    polygon (lat±3, lon±3); intersects/within/disjoint run against a 40x40
    envelope, contains against a 2x2 one — all four ShapeRelation values
    through the generic polygon geometry engine."""
    import json as _json
    from opensearch_ray.aggs.geo import geo_shape_docs_filter

    def boxify(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        shapes = [_json.dumps({"type": "Polygon", "coordinates": [[
            [x - 3, y - 3], [x + 3, y - 3], [x + 3, y + 3],
            [x - 3, y + 3], [x - 3, y - 3]]]})
            for y, x in zip(lat.tolist(), lon.tolist())]
        return pa.table({"event_id": t.column("event_id"),
                         "shape": pa.array(shapes, pa.string())})

    ds = _geo_events(sf_dir).map_batches(boxify, batch_format="pyarrow")
    env_big = {"type": "envelope", "coordinates": [[-20.0, 20.0],
                                                   [20.0, -20.0]]}
    env_small = {"type": "envelope", "coordinates": [[-1.0, 1.0],
                                                     [1.0, -1.0]]}
    parts = []
    for rel, env in (("intersects", env_big), ("within", env_big),
                     ("contains", env_small)):
        out = geo_shape_docs_filter(ds, "shape", env, rel).to_pandas()
        ids = (out["event_id"].astype(np.int64) if len(out)
               else pd.Series([], dtype=np.int64))
        parts.append(pd.DataFrame({"relation": rel, "event_id": ids}))
    return (pd.concat(parts, ignore_index=True)
            .sort_values(["relation", "event_id"]).reset_index(drop=True))


def _q_agg_moving_avg_ewma(sf_dir):
    """moving_avg model=ewma (EwmaModel, alpha=0.5): forward exponential
    smoothing over the trailing 3-bucket window."""
    from opensearch_ray.aggs import date_histogram_agg
    from opensearch_ray.aggs.pipeline import moving_avg_model
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out = moving_avg_model(out, "doc_count", window=3, model="ewma",
                           alpha=0.5, out="mov_ewma")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    out["mov_ewma"] = _fmt(out["mov_ewma"], 4)
    return out[["month", "doc_count", "mov_ewma"]]


def _q_agg_moving_percentiles(sf_dir):
    """moving_percentiles (MovingPercentilesPipelineAggregation): p50/p90
    of the trailing 4-bucket doc_count window over a monthly
    date_histogram (exact linear-interpolated window percentiles)."""
    from opensearch_ray.aggs import date_histogram_agg
    from opensearch_ray.aggs.pipeline import moving_percentiles
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out = moving_percentiles(out, "doc_count", window=4,
                             percents=(50.0, 90.0))
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    out["p50"] = _fmt(out["p50"], 4)
    out["p90"] = _fmt(out["p90"], 4)
    return out[["month", "doc_count", "p50", "p90"]]


def _q_agg_moving_avg_linear(sf_dir):
    """moving_avg model=linear (LinearModel): linearly increasing weights
    toward the most recent bucket."""
    from opensearch_ray.aggs import date_histogram_agg
    from opensearch_ray.aggs.pipeline import moving_avg_model
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out = moving_avg_model(out, "doc_count", window=3, model="linear",
                           out="mov_linear")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    out["mov_linear"] = _fmt(out["mov_linear"], 4)
    return out[["month", "doc_count", "mov_linear"]]


def _q_agg_serial_diff(sf_dir):
    from opensearch_ray.aggs import date_histogram_agg, serial_diff
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out = serial_diff(out, "doc_count", lag=2, out="sdiff")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    out = out.dropna(subset=["sdiff"])
    out["sdiff"] = out["sdiff"].astype(np.int64)
    return out[["month", "sdiff"]]


def _sayt_index(sf_dir: str) -> str:
    """search_as_you_type layout over documents.text (root + 2gram + 3gram +
    edge-ngram prefix sub-indexes, aligned docids)."""
    from opensearch_ray.search.sayt import build_sayt_index
    from opensearch_ray import __version__
    key = hashlib.md5(f"{sf_dir}:{__version__}:sayt1".encode()).hexdigest()[:10]
    idx = f"/tmp/osray_sayt_{key}"
    if not os.path.exists(os.path.join(idx, "sayt.json")):
        build_sayt_index(os.path.join(sf_dir, "documents.parquet"), idx,
                         field="text", base_analyzer="standard",
                         max_shingle_size=3, sort_cols=("doc_id",),
                         num_buckets=4)
    return idx


def _q_search_as_you_type(sf_dir):
    """multi_match type=bool_prefix over a search_as_you_type field
    (ref SearchAsYouTypeFieldMapper.java; tie_breaker=1.0 => field-score sum;
    last term resolved as a TermQuery on ._index_prefix, omitNorms BM25)."""
    from opensearch_ray.search.sayt import SaytSearcher
    s = SaytSearcher(_sayt_index(sf_dir), dtype=np.float64)
    hits = s.query("hash join qu", k=10)
    return pd.DataFrame({
        "doc_id": np.array([h.docid for h in hits], np.int64),
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_agg_percentiles_bucket(sf_dir):
    """percentiles_bucket over the monthly order histogram (nearest-rank,
    ref: pipeline/PercentilesBucketPipelineAggregator.java:92)."""
    from opensearch_ray.aggs import date_histogram_agg, percentiles_bucket
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    res = percentiles_bucket(out, "doc_count",
                             percents=[1.0, 25.0, 50.0, 75.0, 99.0])
    res["percent"] = _fmt(res["percent"], 1)
    res["value"] = _fmt(res["value"], 4)
    return res


def _q_agg_extended_stats_bucket(sf_dir):
    from opensearch_ray.aggs import date_histogram_agg, extended_stats_bucket
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    st = extended_stats_bucket(out, "doc_count")
    return pd.DataFrame({
        "count": [np.int64(st["count"])],
        "min": _fmt([st["min"]], 1), "max": _fmt([st["max"]], 1),
        "sum": _fmt([st["sum"]], 1), "avg": _fmt([st["avg"]], 4),
        "sum_of_squares": _fmt([st["sum_of_squares"]], 1),
        "variance": _fmt([st["variance"]], 4),
        "std_deviation": _fmt([st["std_deviation"]], 4),
    })


def _q_agg_max_bucket(sf_dir):
    """max_bucket: extreme sibling value + ALL tied bucket keys
    (ref: pipeline/InternalBucketMetricValue.java keeps String[] keys)."""
    from opensearch_ray.aggs import date_histogram_agg, max_bucket
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    r = max_bucket(out, "doc_count", key_col="month")
    return pd.DataFrame({
        "keys": [",".join(sorted(r["keys"]))],
        "value": _fmt([r["value"]], 1),
    })


def _q_agg_rare_terms(sf_dir):
    import pyarrow.parquet as pq
    idx = _doc_index(sf_dir)
    t = pq.read_table(os.path.join(idx, "term_stats")).to_pandas()
    out = t[t["df"] <= 2][["term", "df"]].rename(columns={"term": "token"})
    return out.sort_values("token").reset_index(drop=True)


def _q_agg_filters(sf_dir):
    import pyarrow.compute as pc
    from opensearch_ray.aggs import filters_agg
    return filters_agg(_read(sf_dir, "events", ["event_type", "value"]), {
        "errors": lambda t: pc.equal(t.column("event_type"), "error"),
        "big": lambda t: pc.greater(t.column("value"), 150.0),
    })


def _q_agg_bucket_selector(sf_dir):
    from opensearch_ray.aggs import bucket_selector, date_histogram_agg
    out = date_histogram_agg(_read(sf_dir, "orders", ["o_orderdate"]),
                             "o_orderdate", "month")
    thresh = float(out["doc_count"].mean())
    out = bucket_selector(out, lambda b: b["doc_count"] > thresh)
    out["month"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m")
    return out[["month", "doc_count"]]


def _q_agg_significant_terms(sf_dir):
    import pyarrow.compute as pc
    from opensearch_ray.aggs import significant_terms_agg
    out = significant_terms_agg(
        _read(sf_dir, "events", ["event_type", "value"]), "event_type",
        foreground=lambda t: pc.greater(t.column("value"), 150.0), size=10)
    out["score"] = _fmt(out["score"], 6)
    return out[["event_type", "fg", "bg", "score"]]


def _q_sig_scripted(sf_dir):
    """scripted significance heuristic (ScriptHeuristic.java — the last
    registered SignificanceHeuristic): a vectorized callable of the
    script's (_subset_freq, _subset_size, _superset_freq, _superset_size)
    variables; here normalized-lift  (fg/n_fg) / (bg/n_bg)."""
    import pyarrow.compute as pc
    from opensearch_ray.aggs import significant_terms_agg
    out = significant_terms_agg(
        _read(sf_dir, "events", ["event_type", "value"]), "event_type",
        foreground=lambda t: pc.greater(t.column("value"), 150.0), size=10,
        heuristic=lambda fg, n_fg, bg, n_bg:
            (fg / n_fg) / np.maximum(bg / n_bg, 1e-12))
    out["score"] = _fmt(out["score"], 6)
    return out[["event_type", "fg", "bg", "score"]]


def _q_agg_percentiles_hdr(sf_dir):
    """HDR percentiles over lineitem.l_quantity (integers 1..50: the
    digits=2 quantization is identity, so the bucket histogram is exact and
    SQL-comparable via the cumulative-count convention)."""
    from opensearch_ray.aggs import hdr_percentiles
    return hdr_percentiles(_read(sf_dir, "lineitem", ["l_quantity"]),
                           "l_quantity", qs=(25, 50, 95), digits=2)


def _q_agg_percentile_ranks_hdr(sf_dir):
    from opensearch_ray.aggs import hdr_percentile_ranks
    return hdr_percentile_ranks(_read(sf_dir, "lineitem", ["l_quantity"]),
                                "l_quantity", values=[10, 25, 40], digits=2)


def _q_agg_percentile_ranks(sf_dir):
    """t-digest percentile_ranks (approximate — rows-only check)."""
    from opensearch_ray.aggs import percentile_ranks_tdigest
    out = percentile_ranks_tdigest(_read(sf_dir, "events", ["value"]),
                                   "value", values=[50, 150])
    for c in out.columns:
        out[c] = _fmt(out[c], 4)
    return out


def _make_sig_heuristic_q(heuristic: str):
    def q(sf_dir):
        import pyarrow.compute as pc
        from opensearch_ray.aggs import significant_terms_agg
        out = significant_terms_agg(
            _read(sf_dir, "events", ["event_type", "value"]), "event_type",
            foreground=lambda t: pc.greater(t.column("value"), 150.0),
            size=10, heuristic=heuristic)
        out["score"] = _fmt(out["score"], 6)
        out["fg"] = out["fg"].astype(np.int64)
        out["bg"] = out["bg"].astype(np.int64)
        return out[["event_type", "fg", "bg", "score"]]
    return q


_q_agg_sig_chi_square = _make_sig_heuristic_q("chi_square")
_q_agg_sig_mutual_info = _make_sig_heuristic_q("mutual_information")
_q_agg_sig_gnd = _make_sig_heuristic_q("gnd")
_q_agg_sig_percentage = _make_sig_heuristic_q("percentage")


def _sig_nxy_sql(score_expr: str, extra_filter: str = "score > 0") -> str:
    """Shared NXY contingency skeleton for the significance heuristics
    (background_is_superset — NXYSignificanceHeuristic.computeNxys)."""
    return f"""
        WITH per_key AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fg,
                 count(*) AS bg
          FROM events GROUP BY event_type),
        tot AS (SELECT CAST(sum(fg) AS DOUBLE) AS n_fg,
                       CAST(sum(bg) AS DOUBLE) AS n_bg FROM per_key),
        nxy AS (
          SELECT p.event_type, p.fg, p.bg,
                 CAST(p.fg AS DOUBLE) AS n11,
                 t.n_fg - p.fg AS n01,
                 CAST(p.bg - p.fg AS DOUBLE) AS n10,
                 t.n_bg - p.bg - (t.n_fg - p.fg) AS n00,
                 CAST(p.bg AS DOUBLE) AS n1_,
                 t.n_bg - p.bg AS n0_,
                 t.n_fg AS n_1,
                 t.n_bg - t.n_fg AS n_0,
                 t.n_bg AS n
          FROM per_key p CROSS JOIN tot t),
        scored AS (SELECT event_type, fg, bg, {score_expr} AS score FROM nxy)
        SELECT event_type, fg, bg, printf('%.6f', score) AS score
        FROM scored WHERE {extra_filter}
        ORDER BY score DESC, event_type LIMIT 10
    """


def _q_agg_adjacency(sf_dir):
    import pyarrow.compute as pc
    from opensearch_ray.aggs import adjacency_matrix_agg
    return adjacency_matrix_agg(_read(sf_dir, "events", ["event_type", "value"]), {
        "err": lambda t: pc.equal(t.column("event_type"), "error"),
        "big": lambda t: pc.greater(t.column("value"), 150.0),
    })


def _q_query_terms_agg(sf_dir):
    """query + aggregations in one request: terms agg on lang over docs
    matching the query (the core search+aggs shape)."""
    s = _searcher(sf_dir)
    return s.terms_agg_on_hits(_BM25_Q, "lang", size=10)


def _q_field_sort(sf_dir):
    """Field sort: docs matching 'hash' ordered by n_chars desc, top 10."""
    s = _searcher(sf_dir)
    out = s.search_sorted("hash", "n_chars", k=10, ascending=False)
    out = out.rename(columns={"_docid": "doc_id"})
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["doc_id", "n_chars"]]


def _q_completion(sf_dir):
    s = _searcher(sf_dir)
    return s.complete("s", size=8)


def _q_prefix_query(sf_dir):
    s = _searcher(sf_dir)
    return pd.DataFrame({"doc_id": s.prefix_docs("ha").astype(np.int64)})


def _q_wildcard_query(sf_dir):
    s = _searcher(sf_dir)
    return pd.DataFrame({"doc_id": s.wildcard_docs("s*am").astype(np.int64)})


def _q_fuzzy_query(sf_dir):
    s = _searcher(sf_dir)
    return pd.DataFrame({"doc_id": s.fuzzy_docs("hashe", max_edits=1).astype(np.int64)})


def _q_bpe_token_count(sf_dir):
    """Corpus-trained BPE tokenizer (Sennrich ACL'16) + per-doc token
    count — the real token-budget accountant of a training-data pipeline.
    Rows-only (merge learning isn't SQL-expressible); merge semantics and
    determinism are pytest-pinned."""
    from opensearch_ray.textstats import bpe_token_counts, bpe_train
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(ds, "text", n_merges=256)
    out = bpe_token_counts(ds, merges, "text").to_pandas()
    return out[["doc_id", "bpe_tokens"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q_nb_classifier(sf_dir):
    """Multinomial Naive Bayes over hashed token features — the
    fastText-shape supervised quality/language filter (GPT-3 WebText
    classifier, CCNet routing). Trains on (text -> lang), predicts the
    argmax class per doc; exact DuckDB oracle via the DSIR rolling hash."""
    from opensearch_ray.textstats import nb_predict, nb_train
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    model = nb_train(ds, "text", "lang", buckets=2048)
    out = nb_predict(ds, model, "text",
                     score_label="en").to_pandas()
    out["nb_score"] = _fmt(out["nb_score"].values, 4)
    return out[["doc_id", "nb_pred", "nb_score"]].sort_values(
        "doc_id").reset_index(drop=True)


def _q_dedup_remove_spans(sf_dir):
    """Exact-substring dedup with span REMOVAL (Lee et al. ACL'22
    ExactSubstr cut step): k=3 raw-token windows occurring in >= 2 docs
    keep one occurrence, every other occurrence is cut; full text
    rewrite round-trips vs the SQL oracle."""
    from opensearch_ray.dedup.substring import remove_duplicated_spans
    out = remove_duplicated_spans(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=3)
    return out.to_pandas()[["doc_id", "text", "removed_tokens"]] \
        .sort_values("doc_id").reset_index(drop=True)


def _q_fuzzy_transpositions(sf_dir):
    """fuzzy with transpositions=true (FuzzyQueryBuilder's DEFAULT —
    adjacent swap costs ONE edit, the OSA distance of Lucene's
    LevenshteinAutomata withTranspositions). 'hsah' is 1 swap + 1 edit
    from 'hash'-family terms that plain Levenshtein prices at 3+."""
    s = _searcher(sf_dir)
    docs = s.fuzzy_docs("ahsh", max_edits=1, transpositions=True)
    return pd.DataFrame({"doc_id": docs.astype(np.int64)})


def _q_alias_filtered_search(sf_dir):
    """_aliases surface: a filtered alias (filter lang='en') over the
    documents index — the filter rides the collector-level docs= gate,
    scores unaffected (AliasMetadata.filter semantics)."""
    from opensearch_ray.aliases import AliasRegistry
    import tempfile
    idx = _doc_index(sf_dir)
    # registry path keyed by the index dir: a fixed path would accumulate
    # members when the entry runs against different sf dirs in one session
    key = hashlib.md5(idx.encode()).hexdigest()[:10]
    reg = AliasRegistry(os.path.join(tempfile.gettempdir(),
                                     f"osray_alias_entry_{key}.json"))
    reg.update([{"add": {"index": idx, "alias": "docs-en",
                         "filter": {"term": {"lang": "en"}}}}])
    out = reg.search("docs-en", _BM25_Q, k=10, dtype=np.float64)
    return pd.DataFrame({
        "doc_id": out["doc_id"].astype(np.int64),
        "rank": np.arange(1, len(out) + 1, dtype=np.int64),
        "score": _fmt(out["score"], 4)})


def _q_bm25_filtered(sf_dir):
    """BM25 with a keyword filter clause (lang='en') — filter context does
    not affect scores (BoolQueryBuilder.filter semantics)."""
    s = _searcher(sf_dir)
    hits = s.search(_BM25_Q, k=10**9, filters={"lang": "en"})
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "score": _fmt([h.score for h in hits], 4),
    })


def _mf_index(sf_dir: str) -> str:
    """Two-field (title=first-4-tokens, body=text) multi-field index over
    `documents`, cached in /tmp — one sub-index per field, aligned docids."""
    import pyarrow.parquet as pq
    from opensearch_ray import __version__
    from opensearch_ray.search import build_multi_field_index

    key = hashlib.md5(f"{sf_dir}:{__version__}:mf1".encode()).hexdigest()[:10]
    d = f"/tmp/osray_mfidx_{key}"
    if not os.path.exists(os.path.join(d, "fields.json")):
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
        toks = pc.split_pattern(t.column("text"), " ")
        title = pc.binary_join(pc.list_slice(toks, 0, 4), " ")
        tbl = pa.table({"doc_id": t.column("doc_id"), "title": title,
                        "body": t.column("text")})
        os.makedirs(os.path.join(d, "src"), exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "src", "docs.parquet"))
        build_multi_field_index(os.path.join(d, "src", "docs.parquet"), d,
                                fields=["title", "body"], analyzer="transcript",
                                sort_cols=("doc_id",), num_buckets=4)
    return d


def _q_multi_match(sf_dir):
    """multi_match best_fields over title^2 + body (dis_max, tie_breaker=0)."""
    from opensearch_ray.search import MultiFieldSearcher
    s = MultiFieldSearcher(_mf_index(sf_dir), dtype=np.float64)
    hits = s.multi_match(_BM25_Q, {"title": 2.0, "body": 1.0},
                         match_type="best_fields", k=10)
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_multi_match_cross(sf_dir):
    """multi_match type=cross_fields over title^2 + body: term-centric
    blending — per term, df = max across the field group, per-term score
    = max of the per-field contributions (BlendedTermQuery shape)."""
    from opensearch_ray.search import MultiFieldSearcher
    s = MultiFieldSearcher(_mf_index(sf_dir), dtype=np.float64)
    hits = s.multi_match(_BM25_Q, {"title": 2.0, "body": 1.0},
                         match_type="cross_fields", k=10)
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_multi_match_phrase(sf_dir):
    """multi_match type=phrase over title+body: the phrase must appear
    intact in SOME field (doc set exact; compared set-wise)."""
    from opensearch_ray.search import MultiFieldSearcher
    s = MultiFieldSearcher(_mf_index(sf_dir), dtype=np.float64)
    hits = s.multi_match("hash join", {"title": 1.0, "body": 1.0},
                         match_type="phrase", k=10 ** 6)
    return pd.DataFrame({"doc_id": sorted(h.docid for h in hits)})


def _q_dis_max(sf_dir):
    """dis_max over two match subqueries, tie_breaker=0.3."""
    from opensearch_ray.search.features import dis_max
    s = _searcher(sf_dir)
    hits = dis_max(s, [("hash join", "or"), ("stream", "or")],
                   tie_breaker=0.3, k=10)
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_boosting(sf_dir):
    """boosting: positive 'hash join', negative 'merge' demoted by 0.5."""
    from opensearch_ray.search.features import boosting_query
    s = _searcher(sf_dir)
    hits = boosting_query(s, "hash join", "merge", negative_boost=0.5, k=10**9)
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_query_string(sf_dir):
    """query_string mini-language: (hash AND join) OR stream NOT merge."""
    from opensearch_ray.search.features import query_string
    s = _searcher(sf_dir)
    out = query_string(s, '(hash AND join) OR stream NOT merge')
    out["score"] = _fmt(out["score"], 4)
    return out[["doc_id", "score"]]


def _q_phrase_suggest(sf_dir):
    """Phrase suggester: per-term candidates + Stupid-Backoff bigram rerank."""
    from opensearch_ray.search.features import phrase_suggest
    s = _searcher(sf_dir)
    out = phrase_suggest(s, "hash joim", size=5, max_edits=1,
                         candidates_per_term=5, discount=0.4)
    out["score"] = _fmt(out["score"], 6)
    return out[["phrase", "score", "rank"]]


def _q_agg_date_range(sf_dir):
    from opensearch_ray.aggs import date_range_agg
    return date_range_agg(_read(sf_dir, "events", ["ts"]), "ts",
                          [(None, "2024-01-10"),
                           ("2024-01-10", "2024-01-20"),
                           ("2024-01-20", None)])


def _q_agg_sampler(sf_dir):
    """sampler (top shard_size by value) -> terms agg on the sample."""
    from opensearch_ray.aggs import sampler_agg, terms_agg
    sampled = sampler_agg(_read(sf_dir, "events",
                                ["event_id", "event_type", "value"]),
                          by="value", shard_size=1000, tie_col="event_id")
    out = terms_agg(sampled, "event_type", size=10)
    return out[["event_type", "doc_count"]]


def _q_agg_diversified_sampler(sf_dir):
    """diversified_sampler (max 1 doc per user) -> terms agg on the sample."""
    from opensearch_ray.aggs import diversified_sampler_agg, terms_agg
    sampled = diversified_sampler_agg(
        _read(sf_dir, "events", ["event_id", "event_type", "user_id", "value"]),
        diversify_field="user_id", by="value", shard_size=200,
        max_docs_per_value=1, tie_col="event_id")
    out = terms_agg(sampled, "event_type", size=10)
    return out[["event_type", "doc_count"]]


def _q_agg_significant_text(sf_dir):
    """significant_text: JLH-scored tokens of documents.text, fg = lang 'de'."""
    from opensearch_ray.aggs import significant_text_agg
    out = significant_text_agg(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        "text", "doc_id",
        foreground=lambda t: pc.equal(t.column("lang"), "de"),
        analyzer="transcript", size=10)
    out["score"] = _fmt(out["score"], 6)
    return out[["term", "fg", "bg", "score"]]


def _mi_searchers(sf_dir):
    """Two parity-split document indexes (cached in /tmp, keyed by engine
    version), returned as {name: Searcher} in float64 oracle mode."""
    import pyarrow.parquet as pq
    from opensearch_ray import __version__
    from opensearch_ray.index.build import build_index
    from opensearch_ray.search import Searcher

    key = hashlib.md5(f"{sf_dir}:{__version__}:mi1".encode()).hexdigest()[:10]
    root = f"/tmp/osray_miidx_{key}"
    names = ["even", "odd"]
    if not all(os.path.exists(os.path.join(root, n, "manifest.json"))
               for n in names):
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        for n, mask in [("even", ids % 2 == 0), ("odd", ids % 2 == 1)]:
            src = os.path.join(root, f"src_{n}")
            os.makedirs(src, exist_ok=True)
            pq.write_table(t.filter(pa.array(mask)),
                           os.path.join(src, "docs.parquet"))
            build_index(src, os.path.join(root, n), analyzer="transcript",
                        text_col="text", sort_cols=("doc_id",), num_buckets=4)
    return {n: Searcher(os.path.join(root, n), dtype=np.float64)
            for n in names}


def _mi_map_docids(searchers, out):
    """engine docids are subset-local ranks; map back to the table's doc_id"""
    doc_ids = []
    for idx_name, d in zip(out["index"], out["doc_id"]):
        fetched = searchers[idx_name].fetch([int(d)], columns=["doc_id"])
        doc_ids.append(int(fetched.column("doc_id")[0].as_py()))
    return pd.DataFrame({
        "idx": out["index"],
        "doc_id": np.asarray(doc_ids, dtype=np.int64),
        "score": _fmt(out["score"], 4),
    })


def _q_multi_index(sf_dir):
    """Multi-index union: documents split by doc_id parity into two indexes,
    one query over both (per-index stats, query_then_fetch)."""
    from opensearch_ray.search.features import multi_index_search
    searchers = _mi_searchers(sf_dir)
    return _mi_map_docids(searchers,
                          multi_index_search(searchers, _BM25_Q, k=10))


def _q_indices_boost(sf_dir):
    """indices_boost: even index boosted 2.0x, odd 0.5x before the merge."""
    from opensearch_ray.search.features import indices_boost_search
    searchers = _mi_searchers(sf_dir)
    out = indices_boost_search(searchers, _BM25_Q,
                               {"even": 2.0, "odd": 0.5}, k=10)
    return _mi_map_docids(searchers, out)


def _q_post_filter(sf_dir):
    """post_filter: terms agg over ALL matches of the query; hits filtered to
    lang='en' afterwards (filtered_hits column proves the hit-side filter)."""
    from opensearch_ray.search.features import post_filter_search
    r = post_filter_search(_searcher(sf_dir), _BM25_Q, {"lang": "en"},
                           agg_field="source", k=10**9)
    aggs = r["aggregations"].copy()
    aggs["doc_count"] = aggs["doc_count"].astype(np.int64)
    aggs["filtered_hits"] = np.int64(len(r["hits"]))
    return aggs


def _q_min_score(sf_dir):
    """min_score=4.0 cutoff over the fixed BM25 query."""
    from opensearch_ray.search.features import min_score_search
    out = min_score_search(_searcher(sf_dir), _BM25_Q, 4.0, k=10**9)
    return pd.DataFrame({"doc_id": out["_docid"].astype(np.int64),
                         "score": _fmt(out["score"], 4)})


def _q_matched_queries(sf_dir):
    """Named bool clauses: every matching doc lists which clauses hit."""
    from opensearch_ray.search.features import matched_queries_search
    out = matched_queries_search(_searcher(sf_dir),
                                 {"clause_hj": ["hash", "join"],
                                  "clause_st": ["stream"]})
    return pd.DataFrame({"doc_id": out["_docid"].astype(np.int64),
                         "matched": out["matched"]})


def _q_agg_geo_bounds(sf_dir):
    """geo_bounds over the derived coordinates (exact .5-multiples)."""
    from opensearch_ray.aggs.geo import geo_bounds_agg
    b = geo_bounds_agg(_geo_events(sf_dir), "lat", "lon")
    return pd.DataFrame({"top": _fmt([b["top"]], 1),
                         "bottom": _fmt([b["bottom"]], 1),
                         "left": _fmt([b["left"]], 1),
                         "right": _fmt([b["right"]], 1)})


def _nested_orders(sf_dir):
    """orders with their lineitems as a list<struct> child column."""
    from opensearch_ray.nested import nest_children
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_quantity", "l_discount"])
    return nest_children(orders, items, "o_orderkey", "l_orderkey",
                         ["l_orderkey", "l_quantity", "l_discount"],
                         list_col="items")


def _q_nested_query(sf_dir):
    """nested query: parents where ANY child matches (block-join)."""
    from opensearch_ray.nested import nested_filter
    out = nested_filter(
        _nested_orders(sf_dir), "items",
        lambda c: pc.and_(pc.greater(c.column("l_quantity"), 45.0),
                          pc.greater(c.column("l_discount"), 0.05)))
    df = out.to_pandas()[["o_orderkey"]].sort_values("o_orderkey")
    return df.reset_index(drop=True)


def _q_nested_agg(sf_dir):
    """nested aggregation context: child-level stats per parent field."""
    from opensearch_ray.nested import nested_flat_agg
    flat = nested_flat_agg(_nested_orders(sf_dir), "items",
                           parent_cols=["o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        return (t.group_by(["o_orderstatus"])
                .aggregate([([], "count_all"), ("l_quantity", "sum")])
                .rename_columns(["o_orderstatus", "item_count", "qty_sum"]))

    from ray.data.aggregate import Sum
    out = (flat.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderstatus")
           .aggregate(Sum("item_count", alias_name="item_count"),
                      Sum("qty_sum", alias_name="qty_sum"))
           .to_pandas().sort_values("o_orderstatus"))
    out["qty_sum"] = _fmt(out["qty_sum"], 2)
    return out[["o_orderstatus", "item_count", "qty_sum"]].reset_index(drop=True)


def _pj_dataset(sf_dir):
    """The parent-join `join` field shape (ParentJoinFieldMapper): orders
    (parents) and lineitems (children) in ONE dataset, discriminated by
    `rel`, joined on `join_key` (children carry their parent's key — the
    reference's routing value)."""
    def tag_order(t: pa.Table) -> pa.Table:
        return pa.table({
            "join_key": t.column("o_orderkey"),
            "rel": pa.array(np.full(t.num_rows, "order"), pa.string()),
            "o_orderstatus": t.column("o_orderstatus"),
            "o_totalprice": t.column("o_totalprice"),
            "l_quantity": pa.nulls(t.num_rows, pa.float64()),
            "l_linenumber": pa.nulls(t.num_rows, pa.int32()),
        })

    def tag_item(t: pa.Table) -> pa.Table:
        return pa.table({
            "join_key": t.column("l_orderkey"),
            "rel": pa.array(np.full(t.num_rows, "lineitem"), pa.string()),
            "o_orderstatus": pa.nulls(t.num_rows, pa.string()),
            "o_totalprice": pa.nulls(t.num_rows, pa.float64()),
            "l_quantity": t.column("l_quantity"),
            "l_linenumber": t.column("l_linenumber"),
        })

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_totalprice"]) \
        .map_batches(tag_order, batch_format="pyarrow")
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_quantity", "l_linenumber"]) \
        .map_batches(tag_item, batch_format="pyarrow")
    return orders.union(items)


def _q_agg_children(sf_dir):
    """`children` agg (ParentToChildrenAggregator): order-status buckets
    of parents transition to child lineitems — doc_count = children,
    metric = sum(l_quantity) over children."""
    from opensearch_ray.parent_join import children_agg
    out = children_agg(_pj_dataset(sf_dir), "rel", "order", "lineitem",
                       "join_key", "o_orderstatus", value_col="l_quantity")
    out = out.rename(columns={"key": "o_orderstatus"})
    out["sum"] = _fmt(out["sum"].values, 2)
    return out.reset_index(drop=True)


def _q_agg_parent(sf_dir):
    """`parent` agg (ChildrenToParentAggregator): child lineitems with
    quantity >= 45 roll up to DISTINCT parents bucketed by order status."""
    from opensearch_ray.parent_join import parent_agg
    out = parent_agg(
        _pj_dataset(sf_dir), "rel", "order", "lineitem", "join_key",
        "o_orderstatus",
        child_predicate=lambda c: pc.greater_equal(
            c.column("l_quantity"), 45.0))
    return out.rename(columns={"key": "o_orderstatus"}).reset_index(
        drop=True)


def _q_has_child(sf_dir):
    """has_child: orders with >= 2 lineitems of quantity >= 45
    (HasChildQueryBuilder min_children)."""
    from opensearch_ray.parent_join import has_child_filter
    out = has_child_filter(
        _pj_dataset(sf_dir), "rel", "order", "lineitem", "join_key",
        lambda c: pc.greater_equal(c.column("l_quantity"), 45.0),
        min_children=2)
    df = out.to_pandas()[["join_key"]].rename(
        columns={"join_key": "o_orderkey"})
    return df.sort_values("o_orderkey").reset_index(drop=True)


def _q_has_child_score(sf_dir):
    """has_child score_mode=sum: parent score = Σ matching-child
    l_quantity (ScoreMode.Sum of ParentJoinQueryBuilder)."""
    from opensearch_ray.parent_join import has_child_filter
    out = has_child_filter(
        _pj_dataset(sf_dir), "rel", "order", "lineitem", "join_key",
        lambda c: pc.greater_equal(c.column("l_quantity"), 45.0),
        min_children=1, score_mode="sum",
        child_score_fn=lambda c: c.column("l_quantity")
        .to_numpy(zero_copy_only=False))
    df = out.to_pandas()[["join_key", "_score"]].rename(
        columns={"join_key": "o_orderkey", "_score": "score"})
    df = df.sort_values("o_orderkey").reset_index(drop=True)
    df["score"] = _fmt(df["score"], 2)
    return df


def _q_has_parent(sf_dir):
    """has_parent: lineitems whose order is status F with totalprice >
    200k (HasParentQueryBuilder, constant-score filter context)."""
    from opensearch_ray.parent_join import has_parent_filter
    out = has_parent_filter(
        _pj_dataset(sf_dir), "rel", "order", "lineitem", "join_key",
        lambda p: pc.and_(
            pc.equal(p.column("o_orderstatus"), pa.scalar("F")),
            pc.greater(p.column("o_totalprice"), 200000.0)))
    df = out.to_pandas()[["join_key", "l_linenumber"]].rename(
        columns={"join_key": "l_orderkey"})
    df["l_linenumber"] = df["l_linenumber"].astype(np.int64)
    return df.sort_values(["l_orderkey", "l_linenumber"]) \
        .reset_index(drop=True)


def _q_parent_id(sf_dir):
    """parent_id: the children of ONE parent (the smallest lineitem-bearing
    orderkey) — ParentIdQueryBuilder, map-only."""
    from opensearch_ray.parent_join import parent_id_filter
    pv = int(_read(sf_dir, "lineitem", ["l_orderkey"]).min("l_orderkey"))
    out = parent_id_filter(_pj_dataset(sf_dir), "rel", "lineitem",
                           "join_key", pv)
    df = out.to_pandas()[["join_key", "l_linenumber", "l_quantity"]].rename(
        columns={"join_key": "l_orderkey"})
    df["l_linenumber"] = df["l_linenumber"].astype(np.int64)
    df["l_quantity"] = _fmt(df["l_quantity"], 1)
    return df.sort_values(["l_linenumber", "l_quantity"]) \
        .reset_index(drop=True)


def _q_has_child_inner_hits(sf_dir):
    """inner_hits on has_child: per qualifying parent (>= 2 matching
    children), the top-3 matching children ranked by l_linenumber
    (InnerHitsPhase; filter-context score order reduces to the sort key)."""
    from opensearch_ray.parent_join import has_child_inner_hits
    out = has_child_inner_hits(
        _pj_dataset(sf_dir), "rel", "order", "lineitem", "join_key",
        lambda c: pc.greater_equal(c.column("l_quantity"), 45.0),
        inner_sort_col="l_linenumber", size=3, min_children=2)
    df = out.to_pandas()[["join_key", "l_linenumber", "_inner_rank"]].rename(
        columns={"join_key": "o_orderkey", "_inner_rank": "inner_rank"})
    df["l_linenumber"] = df["l_linenumber"].astype(np.int64)
    return df.sort_values(["o_orderkey", "inner_rank", "l_linenumber"]) \
        .reset_index(drop=True)


def _q_nested_inner_hits(sf_dir):
    """inner_hits on a nested query: first 2 matching children per parent
    in l_linenumber order."""
    from opensearch_ray.nested import nest_children, nested_inner_hits
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])
    nested = nest_children(orders, items, "o_orderkey", "l_orderkey",
                           ["l_orderkey", "l_linenumber", "l_quantity",
                            "l_discount"], list_col="items")
    out = nested_inner_hits(
        nested, "items",
        lambda c: pc.and_(pc.greater(c.column("l_quantity"), 45.0),
                          pc.greater(c.column("l_discount"), 0.05)),
        parent_cols=["o_orderkey"], size=2, sort_col="l_linenumber")
    df = out.to_pandas()[["o_orderkey", "l_linenumber", "_inner_rank"]] \
        .rename(columns={"_inner_rank": "inner_rank"})
    df["l_linenumber"] = df["l_linenumber"].astype(np.int64)
    return df.sort_values(["o_orderkey", "inner_rank", "l_linenumber"]) \
        .reset_index(drop=True)


def _q_sort_nested_field(sf_dir):
    """nested-context field sort (FieldSortBuilder.java:122 nestedSort /
    NestedSortBuilder.java): parents ordered by min(l_quantity) over the
    children passing the nested filter (l_discount > 0.05), missing
    parents last, o_orderkey tiebreak — full ranking over a keyed subset
    so the missing tail is exercised."""
    from opensearch_ray.nested import nest_children, nested_field_sort

    def keep_97(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(k % 97 == 0))

    orders = _read(sf_dir, "orders", ["o_orderkey"]) \
        .map_batches(keep_97, batch_format="pyarrow")
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_quantity", "l_discount"])
    nested = nest_children(orders, items, "o_orderkey", "l_orderkey",
                           ["l_orderkey", "l_quantity", "l_discount"],
                           list_col="items")
    out = nested_field_sort(
        nested, "items", "l_quantity",
        predicate=lambda c: pc.greater(c.column("l_discount"), 0.05),
        mode="min", order="asc").to_pandas()
    # deterministic tiebreak within equal keys (the engine's _doc analogue)
    out = out.sort_values(["_nested_sort", "o_orderkey"], kind="mergesort") \
        .reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["sort_key"] = ["missing" if np.isinf(v) else f"{v:.2f}"
                       for v in out["_nested_sort"]]
    return out[["o_orderkey", "sort_key", "rank"]]


def _q_collapse_inner_hits(sf_dir):
    """collapse + inner_hits: top-5 langs by their best BM25 hit, each
    expanded to its top-3 members (110_field_collapsing.yml shape)."""
    s = _searcher(sf_dir)
    from opensearch_ray.search.features import collapse_inner_hits
    out = collapse_inner_hits(s, _BM25_Q, "lang", k=5, inner_size=3)
    out["score"] = _fmt(out["score"], 4)
    out = out.rename(columns={"_docid": "doc_id",
                              "_inner_rank": "inner_rank"})
    return out[["lang", "doc_id", "score", "inner_rank"]] \
        .sort_values(["lang", "inner_rank"]).reset_index(drop=True)


def _q_percolate(sf_dir):
    """Percolator: three registered queries matched against every document."""
    from opensearch_ray.percolator import Percolator
    p = Percolator(analyzer="transcript")
    p.register("q_hash_join", must=["hash", "join"])
    p.register("q_streamish", should=["stream", "window"],
               minimum_should_match=1)
    p.register("q_merge_only", must=["merge"], must_not=["hash"])
    out = p.percolate(_read(sf_dir, "documents", ["doc_id", "text"]),
                      text_col="text", id_col="doc_id").to_pandas()
    return out.sort_values(["doc_id", "query_id"]).reset_index(drop=True)


def _geo_events(sf_dir):
    """events with deterministic derived coordinates (exact .5-multiples, so
    float sums are order-independent): lat = user_id%180-89.5,
    lon = event_id%360-179.5."""
    def derive(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        lat = (uid % 180).astype(np.float64) - 89.5
        lon = (eid % 360).astype(np.float64) - 179.5
        return pa.table({"event_id": t.column("event_id"),
                         "lat": pa.array(lat), "lon": pa.array(lon)})

    return _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow")


def _q_agg_geo_distance(sf_dir):
    from opensearch_ray.aggs.geo import geo_distance_agg
    return geo_distance_agg(_geo_events(sf_dir), "lat", "lon", (0.0, 0.0),
                            [(None, 5e6), (5e6, 1e7), (1e7, None)])


def _q_agg_geo_centroid(sf_dir):
    from opensearch_ray.aggs.geo import geo_centroid_agg
    c = geo_centroid_agg(_geo_events(sf_dir), "lat", "lon")
    return pd.DataFrame({"lat": _fmt([c["lat"]], 6),
                         "lon": _fmt([c["lon"]], 6),
                         "count": [np.int64(c["count"])]})


def _q_agg_ip_range(sf_dir):
    """ip_range over deterministic derived IPv4 strings."""
    from opensearch_ray.aggs import ip_range_agg

    def derive(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ips = [f"10.{int(u) % 256}.{int(e) % 256}.1"
               for u, e in zip(uid, eid)]
        return pa.table({"ip": pa.array(ips, pa.string())})

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow")
    return ip_range_agg(ds, "ip", [(None, "10.100.0.0"),
                                   ("10.100.0.0", "10.200.0.0"),
                                   ("10.200.0.0", None)])


def _q_agg_vwh(sf_dir):
    """variable_width_histogram (clustered buckets — rows-only: the k-means
    boundaries are not SQL-expressible)."""
    from opensearch_ray.aggs import variable_width_histogram_agg
    out = variable_width_histogram_agg(_read(sf_dir, "events", ["value"]),
                                       "value", buckets=8)
    out["key"] = _fmt(out["key"], 4)
    return out[["key", "doc_count", "min", "max"]]


def _q_rank_feature(sf_dir):
    """rank_feature saturation scoring over events.value, top 10."""
    from opensearch_ray.search.features import rank_feature_topk
    out = rank_feature_topk(_read(sf_dir, "events", ["event_id", "value"]),
                            "value", "event_id", k=10,
                            function="saturation", pivot=100.0)
    out["score"] = _fmt(out["score"], 6)
    return out[["event_id", "score", "rank"]]


def _q_geo_distance_query(sf_dir):
    """geo_distance filter: events within 7,000 km of (0,0)."""
    from opensearch_ray.aggs.geo import geo_distance_filter
    out = geo_distance_filter(_geo_events(sf_dir), "lat", "lon",
                              (0.0, 0.0), 7_000_000.0).to_pandas()
    return (_typed(out, {"event_id": "int64"})
            .sort_values("event_id").reset_index(drop=True))


def _q_geo_bounding_box(sf_dir):
    """geo_bounding_box filter: box [(40, -50) top-left, (-40, 50) b-right]."""
    from opensearch_ray.aggs.geo import geo_bounding_box_filter
    out = geo_bounding_box_filter(_geo_events(sf_dir), "lat", "lon",
                                  (40.0, -50.0), (-40.0, 50.0)).to_pandas()
    return (_typed(out, {"event_id": "int64"})
            .sort_values("event_id").reset_index(drop=True))


def _q_agg_geotile_grid(sf_dir):
    """geotile_grid z=4 over derived coordinates, top 20 cells."""
    from opensearch_ray.aggs.geo import geotile_grid_agg
    return geotile_grid_agg(_geo_events(sf_dir), "lat", "lon",
                            precision=4, size=20)


def _q_agg_composite_geotile(sf_dir):
    """composite with a geotile_grid SOURCE (the 4th
    CompositeValuesSourceBuilder type): page 1 of (tile, event_type)
    buckets in key order with a per-bucket avg sub-agg."""
    from opensearch_ray.aggs import composite_agg

    def derive(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "lat": pa.array((uid % 180).astype(np.float64) - 89.5),
            "lon": pa.array((eid % 360).astype(np.float64) - 179.5),
            "event_type": t.column("event_type"),
            "value": t.column("value")})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "value"]) \
        .map_batches(derive, batch_format="pyarrow")
    out = composite_agg(
        ds,
        [{"type": "geotile_grid", "fields": ("lat", "lon"),
          "precision": 4}, "event_type"],
        size=12, sub_aggs={"avg_value": ("avg", "value")})
    out = out.rename(columns={"_src_0": "tile"})
    out["doc_count"] = out["doc_count"].astype(np.int64)
    out["avg_value"] = _fmt(out["avg_value"].values, 4)
    return out[["tile", "event_type", "doc_count", "avg_value"]]


def _q_agg_geohash_grid(sf_dir):
    """geohash_grid precision=2 over derived coordinates, top 15 cells."""
    from opensearch_ray.aggs.geo import geohash_grid_agg
    return geohash_grid_agg(_geo_events(sf_dir), "lat", "lon",
                            precision=2, size=15)


def _q_span_near(sf_dir):
    """span_near in_order: 'hash' then 'stream' with <=3 intervening."""
    s = _searcher(sf_dir)
    docs = s.span_near(["hash", "stream"], slop=3, in_order=True)
    return pd.DataFrame({"doc_id": docs.astype(np.int64)})


def _q_span_near_unordered(sf_dir):
    s = _searcher(sf_dir)
    docs = s.span_near(["hash", "stream"], slop=2, in_order=False)
    return pd.DataFrame({"doc_id": docs.astype(np.int64)})


def _q_range_query(sf_dir):
    """Numeric range query over doc values (RangeQueryBuilder [gte, lt))."""
    s = _searcher(sf_dir)
    docs = s.range_docs("n_chars", {"gte": 200, "lt": 400})
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_bm25_range_filtered(sf_dir):
    """BM25 with a numeric range filter clause — filter context does not
    affect scores (bool.filter + RangeQueryBuilder semantics)."""
    s = _searcher(sf_dir)
    hits = s.search(_BM25_Q, k=10**9,
                    filters={"n_chars": {"gte": 200, "lt": 400}})
    return pd.DataFrame({
        "doc_id": [h.docid for h in hits],
        "score": _fmt([h.score for h in hits], 4),
    })


def _q_phrase_slop(sf_dir):
    """Sloppy phrase (slop=2): matches 'hash join' within an adjusted-offset
    window of 2, transposition included (SloppyPhraseMatcher measure)."""
    s = _searcher(sf_dir)
    docs = s.match_phrase("hash join", slop=2)
    return pd.DataFrame({"doc_id": docs.astype(np.int64)})


def _q_highlight(sf_dir):
    s = _searcher(sf_dir)
    from opensearch_ray.search.features import highlight
    return highlight(s, "hash", k=10).rename(columns={"_docid": "doc_id"})


def _q_highlight_fvh(sf_dir):
    """fvh highlighter: match-cluster fragments + phrase-aware tagging —
    rows-only (fragment scoring not SQL)."""
    s = _searcher(sf_dir)
    from opensearch_ray.search.features import highlight_fvh
    out = highlight_fvh(s, "hash join", k=10, number_of_fragments=2,
                        fragment_char_size=80,
                        matched_fields=["english_stop"])
    return out.rename(columns={"_docid": "doc_id"})


def _q_highlight_unified(sf_dir):
    """unified highlighter (reference default): passage-scored fragments,
    all term occurrences tagged — rows-only (passage scoring not SQL)."""
    s = _searcher(sf_dir)
    from opensearch_ray.search.features import highlight_unified
    out = highlight_unified(s, "hash join", k=10, number_of_fragments=2,
                            fragment_char_size=80)
    return out.rename(columns={"_docid": "doc_id"})


def _q_exists(sf_dir):
    """exists query over a nullable doc-values column (missing-value docs
    excluded — ExistsQueryBuilder)."""
    from opensearch_ray.search import Searcher
    from opensearch_ray.search.queries import exists_docs
    s = Searcher(_doc_index_derived(sf_dir), dtype=np.float64)
    docs = exists_docs(s, "opt_source")
    out = s.fetch(docs.tolist(), columns=["doc_id"]).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _q_terms_set(sf_dir):
    """terms_set: per-doc minimum_should_match from a doc-values field."""
    from opensearch_ray.search import Searcher
    from opensearch_ray.search.queries import terms_set_docs
    s = Searcher(_doc_index_derived(sf_dir), dtype=np.float64)
    docs = terms_set_docs(s, ["hash", "join", "stream"], "required_matches")
    out = s.fetch(docs.tolist(), columns=["doc_id"]).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _q_regexp(sf_dir):
    """regexp query: anchored regex over the terms dict, constant-score
    disjunction of the matching terms."""
    from opensearch_ray.search.queries import regexp_docs
    docs = regexp_docs(_searcher(sf_dir), "st.*m")
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_span_or(sf_dir):
    from opensearch_ray.search.queries import span_or_docs
    docs = span_or_docs(_searcher(sf_dir), ["merge", "sort"])
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_span_first(sf_dir):
    """span_first: 'hash' with span end <= 5 (position < 5)."""
    from opensearch_ray.search.queries import span_first_docs
    docs = span_first_docs(_searcher(sf_dir), "hash", end=5)
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_span_not(sf_dir):
    """span_not: 'hash' occurrences with no 'join' within +-1 position."""
    from opensearch_ray.search.queries import span_not_docs
    docs = span_not_docs(_searcher(sf_dir), "hash", "join", pre=1, post=1)
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_span_containing(sf_dir):
    """span_containing: hash..stream (ordered, slop<=5) containing 'join'."""
    from opensearch_ray.search.queries import span_containing_docs
    docs = span_containing_docs(
        _searcher(sf_dir),
        {"span_near": {"terms": ["hash", "stream"], "slop": 5,
                       "in_order": True}}, "join")
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_intervals(sf_dir):
    """intervals match source: ordered, max_gaps=2."""
    from opensearch_ray.search.queries import intervals_docs
    docs = intervals_docs(_searcher(sf_dir), {
        "match": {"query": "hash stream", "ordered": True, "max_gaps": 2}})
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_intervals_any_of(sf_dir):
    """intervals any_of: union of an ordered and an unordered match."""
    from opensearch_ray.search.queries import intervals_docs
    docs = intervals_docs(_searcher(sf_dir), {"any_of": {"intervals": [
        {"match": {"query": "hash join", "ordered": True, "max_gaps": 0}},
        {"match": {"query": "merge sort", "ordered": False, "max_gaps": 1}},
    ]}})
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_agg_auto_date_histogram(sf_dir):
    """auto_date_histogram over events.ts: the rounding ladder picks the
    coarsest calendar interval with <= 10 buckets
    (AutoDateHistogramAggregationBuilder.RoundingInfo, coarse->fine,
    break at the first unit that overflows the target)."""
    from opensearch_ray.aggs import auto_date_histogram_agg
    ev = _read(sf_dir, "events", ["ts"])
    out = auto_date_histogram_agg(ev, "ts", target_buckets=10)
    out = out.copy()
    out["key"] = pd.to_datetime(out["key"]).dt.strftime("%Y-%m-%d %H:%M:%S")
    out["doc_count"] = out["doc_count"].astype(np.int64)
    return out[["key", "doc_count", "interval"]] \
        .sort_values("key").reset_index(drop=True)


def _q_intervals_all_of_gaps(sf_dir):
    """intervals all_of with ordered+max_gaps (Combine): a 'hash join'
    phrase sub-interval followed by 'stream' within 2 uncovered
    positions — sub-interval span tracking, r4 NotImplementedError gone."""
    from opensearch_ray.search.queries import intervals_docs
    docs = intervals_docs(_searcher(sf_dir), {"all_of": {
        "intervals": [
            {"match": {"query": "hash join", "ordered": True,
                       "max_gaps": 0}},
            {"match": {"query": "stream"}},
        ], "ordered": True, "max_gaps": 2}})
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_span_gap_near(sf_dir):
    """span_near with a span_gap clause (SpanGapQueryBuilder): 'hash',
    exactly one consumed position, then 'stream' at slop 0."""
    from opensearch_ray.search.queries import span_near_clauses_docs
    docs = span_near_clauses_docs(
        _searcher(sf_dir), ["hash", {"span_gap": {"text": 1}}, "stream"],
        slop=0, in_order=True)
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_intervals_filter(sf_dir):
    """intervals match wrapped by an IntervalFilter: ordered 'hash stream'
    windows (max_gaps 2, minimal-interval discipline) that do NOT contain
    a 'join' — span-level filter semantics
    (IntervalsSourceProvider.IntervalFilter)."""
    from opensearch_ray.search.queries import intervals_docs
    docs = intervals_docs(_searcher(sf_dir), {"match": {
        "query": "hash stream", "ordered": True, "max_gaps": 2,
        "filter": {"not_containing": {"match": {"query": "join"}}}}})
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_intervals_prefix_combine(sf_dir):
    """intervals prefix source inside an ordered all_of combine
    (IntervalsSourceProvider.Prefix): a 'ha'-prefixed term immediately
    followed by 'join' within one uncovered position."""
    from opensearch_ray.search.queries import intervals_docs
    docs = intervals_docs(_searcher(sf_dir), {"all_of": {
        "intervals": [{"prefix": {"prefix": "ha"}},
                      {"match": {"query": "join"}}],
        "ordered": True, "max_gaps": 1}})
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_match_bool_prefix(sf_dir):
    """match_bool_prefix: 'hash' as a term clause OR last token 'joi' as a
    prefix clause."""
    from opensearch_ray.search.queries import match_bool_prefix_docs
    docs = match_bool_prefix_docs(_searcher(sf_dir), "hash joi")
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})

def _event_index(sf_dir: str) -> str:
    """Index over `events` (text = event_type, one token per doc), cached in
    /tmp — gives the date doc-values surface (ts) for distance_feature."""
    from opensearch_ray import __version__
    from opensearch_ray.index.build import build_index
    key = hashlib.md5(f"{sf_dir}:{__version__}:ev1".encode()).hexdigest()[:10]
    idx = f"/tmp/osray_evidx_{key}"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_index(os.path.join(sf_dir, "events.parquet"), idx,
                    analyzer="transcript", text_col="event_type",
                    sort_cols=("event_id",), num_buckets=4)
    return idx


def _q_fetch_docvalue_format(sf_dir):
    """docvalue_fields `format` option (DocValueFieldsContext +
    DateFormatter): the ts doc value rendered as yyyy-MM-dd HH:mm:ss and
    as epoch_millis in the same projection."""
    from opensearch_ray.search import Searcher, dsl
    s = Searcher(_event_index(sf_dir), dtype=np.float64)
    body = {"query": {"range": {"value": {"gte": 99.0}}},
            "sort": [{"event_id": "asc"}], "size": 12}
    r = dsl.execute_search(s, {**body, "docvalue_fields": [
        {"field": "ts", "format": "yyyy-MM-dd HH:mm:ss"}]},
        id_col="event_id")
    r2 = dsl.execute_search(s, {**body, "docvalue_fields": [
        {"field": "ts", "format": "epoch_millis"}]}, id_col="event_id")
    out = r[["event_id", "ts"]].copy()
    out["event_id"] = out["event_id"].astype(np.int64)
    out["ts_millis"] = r2["ts"].astype(np.int64).to_numpy()
    return out.reset_index(drop=True)


def _q_dsl_agg_calendar_pct(sf_dir):
    """Round-5 request-body aggs over the events index: calendar
    date_histogram (Monday-aligned weeks), exact nearest-rank
    percentiles, extended_stats — per-segment folds in execute_aggs."""
    from opensearch_ray.search import Searcher, dsl
    s = Searcher(_event_index(sf_dir), dtype=np.float64)
    r = dsl.execute_request(s, {
        "query": {"match_all": {}},
        "aggs": {"w": {"date_histogram": {"field": "ts",
                                          "calendar_interval": "week"}},
                 "p": {"percentiles": {"field": "value",
                                       "percents": [25.0, 50.0, 95.0]}},
                 "es": {"extended_stats": {"field": "value"}}},
        "size": 0}, id_col="event_id")
    rows = []
    for b in r["aggregations"]["w"]["buckets"]:
        rows.append(("week_" + b["key_as_string"][:10],
                     str(b["doc_count"])))
    for p, v in r["aggregations"]["p"]["values"].items():
        rows.append((f"p{p}", f"{v:.4f}"))
    es = r["aggregations"]["es"]
    for k in ("count",):
        rows.append((f"es_{k}", str(es[k])))
    for k in ("min", "max", "sum", "avg", "std_deviation"):
        rows.append((f"es_{k}", f"{es[k]:.4f}"))
    out = pd.DataFrame(rows, columns=["stat", "value"])
    return out.sort_values("stat").reset_index(drop=True)


def _q_agg_terms_partition(sf_dir):
    """terms with include/exclude regexes + md5 partition iteration
    (IncludeExclude partitioned mode): partition 1 of 3 over
    documents.source, excluding src9."""
    from opensearch_ray.aggs import terms_agg
    docs = _read(sf_dir, "documents", ["source"])
    out = terms_agg(docs, "source", size=50, include="src.*",
                    exclude="src9", include_partition=(1, 3))
    out["doc_count"] = out["doc_count"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def _q_agg_composite_hist(sf_dir):
    """composite with a histogram SOURCE + a terms source
    (CompositeValuesSourceBuilder): first page in key order."""
    from opensearch_ray.aggs import composite_agg
    ev = _read(sf_dir, "events", ["value", "event_type"])
    out = composite_agg(
        ev, [{"field": "value", "type": "histogram", "interval": 50.0},
             "event_type"], size=12)
    out = out.rename(columns={"_src_0": "value_bucket"})
    out["value_bucket"] = _fmt(out["value_bucket"], 1)
    out["doc_count"] = out["doc_count"].astype(np.int64)
    return out[["value_bucket", "event_type", "doc_count"]] \
        .reset_index(drop=True)


def _q_ids(sf_dir):
    """ids query: doc-values membership of the stored id."""
    from opensearch_ray.search.queries import ids_docs
    s = _searcher(sf_dir)
    docs = ids_docs(s, [3, 7, 450, 999_999_999], "doc_id")
    out = s.fetch(docs.tolist(), columns=["doc_id"]).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _q_constant_score(sf_dir):
    """constant_score: term filter 'hash', every hit scores boost=1.5."""
    from opensearch_ray.search.queries import constant_score_docs
    s = _searcher(sf_dir)
    docs, scores = constant_score_docs(s, s.term_docs("hash"), boost=1.5)
    return pd.DataFrame({"doc_id": docs, "score": _fmt(scores, 4)})


def _q_simple_query_string(sf_dir):
    """simple_query_string exercising phrase | (prefix AND NOT term)."""
    from opensearch_ray.search.queries import simple_query_string_docs
    docs = simple_query_string_docs(
        _searcher(sf_dir), '"hash join" | (str* + -batch)')
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_distance_feature(sf_dir):
    """distance_feature on a date field: candidates = term 'click', score =
    boost * pivot / (pivot + |ts - origin| ms), top-10."""
    from opensearch_ray.search.queries import distance_feature_topk
    from opensearch_ray.search import Searcher
    s = Searcher(_event_index(sf_dir), dtype=np.float64)
    cand = s.term_docs("click")
    pivot_ms = 3 * 24 * 3600 * 1000.0
    docs, scores = distance_feature_topk(
        s, "ts", "2024-01-15T00:00:00", pivot_ms, cand, k=10, boost=2.0)
    out = s.fetch(docs.tolist(), columns=["event_id"]).to_pandas()
    out = out.set_index("_docid").loc[docs]
    return pd.DataFrame({"event_id": out["event_id"].to_numpy(),
                         "rank": np.arange(1, len(docs) + 1, dtype=np.int64),
                         "score": _fmt(scores, 6)})


def _q_script_score(sf_dir):
    """script_score: filter term 'hash', score = ln(1 + n_chars), top-10."""
    from opensearch_ray.search.queries import script_score_topk
    s = _searcher(sf_dir)
    docs, scores = script_score_topk(
        s, s.term_docs("hash"), lambda dv: np.log1p(dv["n_chars"]), k=10)
    return pd.DataFrame({"doc_id": docs,
                         "rank": np.arange(1, len(docs) + 1, dtype=np.int64),
                         "score": _fmt(scores, 4)})


def _q_span_multi(sf_dir):
    """span_near [term 'hash', span_multi(prefix 'jo')], slop=2, ordered."""
    from opensearch_ray.search.queries import span_near_clauses_docs
    docs = span_near_clauses_docs(
        _searcher(sf_dir), ["hash", {"span_multi": {"prefix": "jo"}}],
        slop=2, in_order=True)
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_field_masking_span(sf_dir):
    """field_masking_span: body-field 'hash' adjacent to title-field 'join'
    (title = first 4 body tokens, so positions align — the stemmed-subfield
    pattern FieldMaskingSpanQueryBuilder exists for)."""
    from opensearch_ray.search import MultiFieldSearcher
    from opensearch_ray.search.queries import field_masking_span_docs
    mfs = MultiFieldSearcher(_mf_index(sf_dir), dtype=np.float64)
    docs = field_masking_span_docs(
        mfs, [("body", "hash"), ("title", "join")], slop=0, in_order=True)
    return pd.DataFrame({"doc_id": np.sort(docs).astype(np.int64)})


def _q_fetch_source_filter(sf_dir):
    """_source filtering: wildcard includes/excludes resolve to a pruned
    column read (FetchSourcePhase)."""
    from opensearch_ray.search.fetch_phase import fetch_source
    s = _searcher(sf_dir)
    docs = s.term_docs("stream")
    t = fetch_source(s, docs.tolist(),
                     includes=["doc_id", "lang", "source"],
                     excludes=["source"])
    out = t.to_pandas()[["doc_id", "lang"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_fetch_docvalue_fields(sf_dir):
    """docvalue_fields: columnar per-segment gather, no stored-source read."""
    from opensearch_ray.search.fetch_phase import docvalue_fields
    s = _searcher(sf_dir)
    docs = s.term_docs("window")
    out = docvalue_fields(s, docs.tolist(), ["doc_id", "n_chars"])
    out = out[["doc_id", "n_chars"]].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_fetch_script_fields(sf_dir):
    """script_fields: computed per-hit columns over fetched stored fields."""
    from opensearch_ray.search.fetch_phase import script_fields
    s = _searcher(sf_dir)
    docs = s.term_docs("merge")
    out = script_fields(
        s, docs.tolist(),
        {"doc_id": lambda t: t.column("doc_id").to_numpy(zero_copy_only=False),
         "chars_bucket": lambda t: t.column("n_chars").to_numpy(
             zero_copy_only=False) // 100,
         "lang_src": lambda t: np.array(
             [f"{a}:{b}" for a, b in zip(t.column("lang").to_pylist(),
                                         t.column("source").to_pylist())])},
        source_columns=["doc_id", "n_chars", "lang", "source"])
    out = out[["doc_id", "chars_bucket", "lang_src"]]
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["chars_bucket"] = out["chars_bucket"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_sort_field_missing(sf_dir):
    """field sort with missing _last over a nullable doc-values column
    (FieldSortBuilder missing placement)."""
    from opensearch_ray.search import Searcher
    from opensearch_ray.search.sort_phase import sort_hits
    s = Searcher(_doc_index_derived(sf_dir), dtype=np.float64)
    docs = s.term_docs("hash")
    page = sort_hits(s, docs.tolist(), [
        {"field": "opt_source", "order": "asc", "missing": "_last"},
        {"field": "doc_id", "order": "asc"},
    ], size=15)
    ids = s.fetch(page["_docid"].tolist(), columns=["doc_id"]).to_pandas()
    order = {d: i for i, d in enumerate(page["_docid"])}
    ids = ids.sort_values("_docid", key=lambda c: c.map(order))
    return pd.DataFrame({
        "doc_id": ids["doc_id"].values.astype(np.int64),
        "opt_source": page["sort_0"].values,
        "rank": np.arange(1, len(page) + 1, dtype=np.int64)})


def _q_sort_script_page(sf_dir):
    """script sort (computed key) + from/size paging."""
    from opensearch_ray.search.sort_phase import sort_hits
    s = _searcher(sf_dir)
    docs = s.term_docs("join")
    page = sort_hits(s, docs.tolist(), [
        {"script": lambda t: t.column("n_chars").to_numpy(
            zero_copy_only=False) % 7, "order": "asc",
         "source_columns": ["n_chars", "doc_id"]},
        {"field": "doc_id", "order": "asc"},
    ], size=20, from_=5)
    ids = s.fetch(page["_docid"].tolist(), columns=["doc_id"]).to_pandas()
    order = {d: i for i, d in enumerate(page["_docid"])}
    ids = ids.sort_values("_docid", key=lambda c: c.map(order))
    return pd.DataFrame({
        "doc_id": ids["doc_id"].values.astype(np.int64),
        "mod7": page["sort_0"].values.astype(np.int64),
        "rank": np.arange(1, len(page) + 1, dtype=np.int64)})


def _q_sort_geo_distance(sf_dir):
    """geo_distance sort: nearest events to the origin (haversine meters)."""
    from opensearch_ray.search.sort_phase import geo_distance_sort
    out = geo_distance_sort(_geo_events(sf_dir), "lat", "lon", (0.0, 0.0),
                            k=15)
    return pd.DataFrame({
        "event_id": out["event_id"].values.astype(np.int64),
        "dist": _fmt(out["_distance"].values, 1),
        "rank": np.arange(1, len(out) + 1, dtype=np.int64)})


# ----------------------------------------------------------------- contract

def _pii_sql() -> str:
    """Same derived dirty strings + the SAME RE2 patterns as the engine
    (textstats.pii.PII_PATTERNS), applied in the same order."""
    from opensearch_ray.textstats.pii import PII_PATTERNS
    expr = ("printf('id%d email user%d@example.com phone 555-%03d-%04d "
            "ip 10.%d.%d.7 ssn %d-%d-%d end', event_id, user_id, "
            "user_id % 1000, event_id % 10000, user_id % 256, "
            "event_id % 256, 100 + user_id % 900, 10 + event_id % 90, "
            "1000 + user_id % 9000)")
    for label, pat in PII_PATTERNS.items():
        sq = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sq}', '[{label}]', 'g')"
    return (f"SELECT event_id, {expr} AS text FROM events "
            "ORDER BY event_id")


def _q_dsl_request_aggs(sf_dir):
    """Full request: query + aggs tree (terms/stats/global>avg) +
    post_filter — aggregations over ALL matches, hits narrowed afterwards.
    Long-format (agg, key, value) rows for the oracle compare."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    body = {"query": {"match": {"text": "hash join"}},
            "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}},
                     "chars": {"stats": {"field": "n_chars"}},
                     "everything": {"global": {},
                                    "aggs": {"avg_chars":
                                             {"avg":
                                              {"field": "n_chars"}}}}},
            "post_filter": {"term": {"lang": "en"}},
            "size": 5}
    r = dsl.execute_request(s, body)
    rows = []
    for b in r["aggregations"]["by_lang"]["buckets"]:
        rows.append(("by_lang", str(b["key"]), str(b["doc_count"])))
    st = r["aggregations"]["chars"]
    rows.append(("chars", "count", str(st["count"])))
    for k in ("min", "max", "sum", "avg"):
        rows.append(("chars", k, _fmt([st[k]], 4)[0]))
    g = r["aggregations"]["everything"]
    rows.append(("global", "doc_count", str(g["doc_count"])))
    rows.append(("global.avg_chars", "value",
                 _fmt([g["avg_chars"]["value"]], 4)[0]))
    for rank, did in enumerate(r["hits"]["doc_id"], 1):
        rows.append(("hit", str(rank), str(did)))
    return (pd.DataFrame(rows, columns=["agg", "key", "value"])
            .sort_values(["agg", "key"]).reset_index(drop=True))


def _q_normalizer_term(sf_dir):
    """keyword `normalizer`: a term query for 'EN' under a lowercase +
    asciifolding normalizer matches lang='en' docs (AnalysisRegistry
    normalizers — filters without tokenization, index+query symmetric)."""
    from opensearch_ray.mapper import normalized_term_docs
    s = _searcher(sf_dir)
    docs = normalized_term_docs(s, "lang", "EN",
                                filters=("lowercase", "asciifolding"))
    t = s.fetch([int(d) for d in docs], columns=["doc_id"])
    return pd.DataFrame({"doc_id": sorted(t.column("doc_id").to_pylist())})


def _q_termvectors(sf_dir):
    """_termvectors over one document (doc_id=42): on-the-fly re-analysis
    from the stored source + term_statistics df via pinpoint terms-dict
    reads (action/termvectors/TermVectorsService.java)."""
    from opensearch_ray.search.features import termvectors
    s = _searcher(sf_dir)
    t = s.get_by("doc_id", 42)
    gid = int(t.column("_docid")[0].as_py())
    return termvectors(s, gid, term_statistics=True)


def _q_rank_features_query(sf_dir):
    """rank_features (plural) field (mapper-extras
    RankFeaturesFieldMapper): saturation-scored rank_feature query on the
    'k' key of the events.props JSON map, top 10."""
    from opensearch_ray.search.features import rank_features_topk
    ev = _read(sf_dir, "events", ["event_id", "props"])
    out = rank_features_topk(ev, "props", "k", "event_id", k=10,
                             function="saturation", pivot=50.0)
    out["score"] = _fmt(out["score"], 6)
    return out[["event_id", "rank", "score"]].reset_index(drop=True)


def _q_murmur3_field(sf_dir):
    """murmur3 field type (plugins/mapper-murmur3): per-doc x64_128 h1
    doc-values over documents.source — distinct hash count equals the
    exact distinct count (the mapper's cardinality-agg contract; the
    hash algorithm itself is pinned by published-test-vector goldens)."""
    from opensearch_ray.search.features import murmur3_column
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    hashed = murmur3_column(docs, "source").to_pandas()
    assert hashed["_murmur3"].nunique() == hashed["source"].nunique()
    return pd.DataFrame({
        "n_hashes": np.array([hashed["_murmur3"].nunique()], np.int64)})


def _q_mtermvectors(sf_dir):
    """_mtermvectors (rest-api-spec/api/mtermvectors.json): batched
    termvectors over three docs — one stored-source fetch, deduplicated
    term_statistics df lookups."""
    from opensearch_ray.search.features import mtermvectors
    s = _searcher(sf_dir)
    gids, by_gid = [], {}
    for did in (7, 42, 99):
        t = s.get_by("doc_id", did)
        g = int(t.column("_docid")[0].as_py())
        gids.append(g)
        by_gid[g] = did
    out = mtermvectors(s, gids, term_statistics=True)
    out["doc_id"] = out["docid"].map(by_gid).astype(np.int64)
    return out[["doc_id", "term", "term_freq", "positions", "doc_freq"]] \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)


def _q_stratified_sample(sf_dir):
    """Deterministic stratified sampling for training-data mixes: keep
    rates per source stratum via Knuth's multiplicative hash over doc_id
    (reproducible in SQL — no random stream)."""
    from opensearch_ray.pipelines.sampling import stratified_sample
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    out = stratified_sample(
        docs, "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
        default_rate=0.02).to_pandas()
    return out.astype({"doc_id": np.int64}) \
        .sort_values("doc_id").reset_index(drop=True)


def _q_pack_sequences(sf_dir):
    """Concat-then-chunk sequence packing (the pretraining batch shape):
    id-ordered token stream cut into 512-token sequences per fixed id
    group — one low-cardinality groupby, vectorized cumsum."""
    from opensearch_ray.pipelines.sampling import pack_sequences
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = pack_sequences(docs, budget=512, group_size=1000).to_pandas()
    out = out.astype({c: np.int64 for c in
                      ("doc_id", "n_tokens", "group", "seq", "offset")})
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_semantic_dedup(sf_dir):
    """SemDeDup (Abbas et al. arXiv:2303.09540): k-means clusters +
    within-cluster cosine pruning with the keep-far policy over the
    embeddings table (rows-only — k-means is not SQL-expressible)."""
    from opensearch_ray.dedup import semantic_dedup
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = semantic_dedup(emb, eps=0.97, n_clusters=8).to_pandas()
    return out.astype({"vec_id": np.int64, "cluster": np.int64,
                       "keep": bool}) \
        .sort_values("vec_id").reset_index(drop=True)


def _q_dedup_substring_stats(sf_dir):
    """Exact substring-level dedup signal (Lee et al. ACL'22, hashed
    k-token windows): per doc, distinct 8-token windows that also occur
    in another doc. One hash(window)%P shuffle, vectorized partition
    reduction (dedup/substring.py)."""
    from opensearch_ray.dedup import duplicated_window_stats
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = duplicated_window_stats(docs, k=8).to_pandas()
    out = out[out["n_dup_windows"] > 0]
    out = out.astype({"doc_id": np.int64, "n_windows": np.int64,
                      "n_dup_windows": np.int64})
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_decontaminate(sf_dir):
    """Benchmark decontamination: flag docs sharing any 8-token window
    with the 'benchmark' subset (doc_id % 500 == 0) — broadcast window-
    hash kill-set, map-only corpus scan (dedup/substring.py)."""
    from opensearch_ray.dedup import decontaminate

    def keep_bench(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(k % 500 == 0))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(keep_bench, batch_format="pyarrow")
    out = decontaminate(docs, bench, k=8).to_pandas()
    flagged = out[out["contaminated"]][["doc_id"]] \
        .astype({"doc_id": np.int64})
    return flagged.sort_values("doc_id").reset_index(drop=True)


def _q_dsl_agg_terms_sub(sf_dir):
    """Round-5 request-body sub-agg tree: terms over lang with a per-
    bucket avg + max over n_chars and a nested range sub-agg, all inside
    the query's filter-context match set (AggregatorFactories nesting)."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    r = dsl.execute_request(s, {
        "query": {"match": {"text": "hash join"}},
        "aggs": {"langs": {"terms": {"field": "lang", "size": 10},
                           "aggs": {"avg_len": {"avg": {
                               "field": "n_chars"}},
                               "len_rg": {"range": {
                                   "field": "n_chars",
                                   "ranges": [{"to": 400.0},
                                              {"from": 400.0}]},
                                   "aggs": {"mx": {"max": {
                                       "field": "n_chars"}}}}}}},
        "size": 0})
    rows = []
    for b in r["aggregations"]["langs"]["buckets"]:
        rows.append((str(b["key"]), "count", str(b["doc_count"])))
        rows.append((str(b["key"]), "avg_len",
                     f"{b['avg_len']['value']:.4f}"))
        for rb in b["len_rg"]["buckets"]:
            rows.append((str(b["key"]), f"rg_{rb['key']}_count",
                         str(rb["doc_count"])))
            mx = rb["mx"]["value"]
            rows.append((str(b["key"]), f"rg_{rb['key']}_max",
                         "null" if mx is None or mx == -np.inf
                         else f"{mx:.1f}"))
    out = pd.DataFrame(rows, columns=["lang", "stat", "value"])
    return out.sort_values(["lang", "stat"]).reset_index(drop=True)


def _q_dsl_agg_hist_range_card(sf_dir):
    """Round-4b request-body aggs: histogram (min_doc_count=0 empty-bucket
    fill), range ([from, to) semantics), cardinality (exact fold) — all
    over the query's filter-context match set (HistogramAggregator /
    RangeAggregator / CardinalityAggregator request shapes)."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    body = {"query": {"match": {"text": "hash join"}},
            "aggs": {"h": {"histogram": {"field": "n_chars",
                                         "interval": 100}},
                     "rg": {"range": {"field": "n_chars",
                                      "ranges": [{"to": 300},
                                                 {"from": 300, "to": 600},
                                                 {"from": 600}]}},
                     "card": {"cardinality": {"field": "lang"}}},
            "size": 0}
    r = dsl.execute_request(s, body)
    rows = []
    for b in r["aggregations"]["h"]["buckets"]:
        rows.append(("h", str(int(b["key"])), str(b["doc_count"])))
    for b in r["aggregations"]["rg"]["buckets"]:
        rows.append(("rg", b["key"], str(b["doc_count"])))
    rows.append(("card", "lang", str(r["aggregations"]["card"]["value"])))
    return (pd.DataFrame(rows, columns=["agg", "key", "value"])
            .sort_values(["agg", "key"]).reset_index(drop=True))


def _q_agg_percentiles_hdr_price(sf_dir):
    """HDR percentiles over CONTINUOUS values (l_extendedprice, digits=3) —
    non-identity quantization, oracle-exact: the SQL reproduces the
    mantissa-bit mask via exact power-of-two scaling (v/2^(e-10) is an
    exact IEEE op) with a guarded floor(log2) exponent."""
    from opensearch_ray.aggs.metrics import hdr_percentiles
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    out = hdr_percentiles(ds, "l_extendedprice", qs=(25, 50, 75, 99),
                          digits=3)
    for c in out.columns:
        out[c] = _fmt(out[c].values, 6)
    return out


def _q_agg_terms_order(sf_dir):
    """terms agg ordered by a sub-agg metric (BucketOrder.aggregation):
    top shipdates... keys by sum(l_quantity) descending."""
    from opensearch_ray.aggs import terms_agg
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = terms_agg(ds, "l_returnflag", size=3, sum_col="l_quantity",
                    order=("sum", "desc"))
    out = out.rename(columns={"sum_l_quantity": "qty_sum"})
    out["qty_sum"] = _fmt(out["qty_sum"].values, 2)
    return out[["l_returnflag", "doc_count", "qty_sum"]]


def _q_field_caps(sf_dir):
    """_field_caps: per-field type + searchable/aggregatable capabilities."""
    from opensearch_ray.search.dsl import field_caps
    return field_caps(_searcher(sf_dir))


def _q_validate_query(sf_dir):
    """_validate/query: parse-only validation (no execution)."""
    from opensearch_ray.search.dsl import validate_query
    s = _searcher(sf_dir)
    cases = {
        "good_bool": {"bool": {"must": [{"match": {"text": "hash"}}],
                               "filter": [{"range": {"n_chars":
                                                     {"gte": 1}}}]}},
        "unknown_kind": {"fuzzy_matchy": {"text": "x"}},
        "multi_field_term": {"term": {"a": 1, "b": 2}},
    }
    rows = [{"check_name": k, "valid": validate_query(s, q)["valid"]}
            for k, q in cases.items()]
    return pd.DataFrame(rows).sort_values("check_name").reset_index(drop=True)


def _q_agg_significant_text_dedup(sf_dir):
    """significant_text with filter_duplicate_text: exact duplicate texts
    (keep lowest doc_id) are dropped before fg/bg counting."""
    from opensearch_ray.aggs import significant_text_agg
    out = significant_text_agg(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        "text", "doc_id",
        foreground=lambda t: pc.equal(t.column("lang"), "de"),
        analyzer="transcript", size=10, filter_duplicate_text=True)
    out["score"] = _fmt(out["score"], 6)
    return out[["term", "fg", "bg", "score"]]


def _q_agg_composite_sub(sf_dir):
    """composite with SUB-AGGREGATIONS (sum/avg/max under each bucket) and
    an after-key cursor — the reference's per-bucket sub-agg tree."""
    from opensearch_ray.aggs.bucket import composite_agg
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])
    out = composite_agg(
        ds, ["l_returnflag", "l_linestatus"], size=3, after=("A", "F"),
        sub_aggs={"qty_sum": ("sum", "l_quantity"),
                  "price_avg": ("avg", "l_extendedprice"),
                  "disc_max": ("max", "l_discount")})
    out["qty_sum"] = _fmt(out["qty_sum"].values, 2)
    out["price_avg"] = _fmt(out["price_avg"].values, 4)
    out["disc_max"] = _fmt(out["disc_max"].values, 2)
    return out


def _q_repetition_stats(sf_dir):
    """Gopher-style repetition quality signals per document (map-only)."""
    from opensearch_ray.textstats.repetition import repetition_stats
    out = (repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]),
                            "text", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return out


def _q_pii_redact(sf_dir):
    """PII scrub over deterministically derived dirty text (testdata has no
    PII by construction — the derivation IS part of the contract; the
    oracle re-derives the same strings and redacts with SQL regexp_replace
    using the SAME RE2 patterns)."""
    from opensearch_ray.textstats.pii import redact_pii

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        txt = [f"id{ei} email user{ui}@example.com "
               f"phone 555-{ui % 1000:03d}-{ei % 10000:04d} "
               f"ip 10.{ui % 256}.{ei % 256}.7 "
               f"ssn {100 + ui % 900}-{10 + ei % 90}-{1000 + ui % 9000} end"
               for ui, ei in zip(u, e)]
        return pa.table({"event_id": t.column("event_id"),
                         "text": pa.array(txt, pa.string())})

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow")
    out = redact_pii(ds, ["text"]).to_pandas()
    return (out[["event_id", "text"]].sort_values("event_id")
            .reset_index(drop=True))


def _q_date_math_range(sf_dir):
    """Range filter with date-math bounds (JavaDateMathParser): gte rounds
    down to start-of-day, lte rounds UP to end-of-day (minus 1 ms)."""
    from opensearch_ray.datemath import date_math_us
    lo = date_math_us("2024-01-03||+1w/d")
    hi = date_math_us("2024-01-03||+2w/d", round_up=True)

    def filt(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ts >= lo) & (ts <= hi)))

    out = (_read(sf_dir, "events", ["event_id", "ts"])
           .map_batches(filt, batch_format="pyarrow").to_pandas())
    return (_typed(out, {"event_id": "int64"})
            .sort_values("event_id").reset_index(drop=True))


def _typed(df, schema):
    """Empty Ray results lose their schema in to_pandas() — project to the
    declared columns, synthesizing a typed empty frame when needed."""
    if len(df) == 0 or not set(schema) <= set(df.columns):
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in schema.items()})
    return df[list(schema)]


def _doc_index_vec(sf_dir: str) -> str:
    """Index over documents JOINED with their embedding (vec_id == doc_id),
    cached in /tmp — the knn-query surface: a list<float> doc-values column
    next to the indexed text."""
    from opensearch_ray import __version__
    from opensearch_ray.index.build import build_index
    key = hashlib.md5(f"{sf_dir}:{__version__}:vec1".encode()).hexdigest()[:10]
    root = f"/tmp/osray_docidx_vec_{key}"
    idx = os.path.join(root, "idx")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        import pyarrow.parquet as _pq
        corpus = os.path.join(root, "corpus")
        os.makedirs(corpus, exist_ok=True)
        docs = _pq.read_table(os.path.join(sf_dir, "documents.parquet")
                              ).sort_by("doc_id")
        embs = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"]
                              ).sort_by("vec_id")
        # Arrow joins reject list<float> payloads — align by sorted id
        did = docs.column("doc_id").to_numpy()
        vid = embs.column("vec_id").to_numpy()
        pos = np.searchsorted(vid, did)
        emb_col = embs.column("embedding").combine_chunks().take(
            pa.array(pos))
        joined = docs.append_column("embedding", emb_col)
        _pq.write_table(joined, os.path.join(corpus, "part-0.parquet"))
        build_index(corpus, idx, analyzer="transcript", text_col="text",
                    sort_cols=("doc_id",), num_buckets=4)
    return idx


def _q_knn_query(sf_dir):
    """knn query through the DSL: exact cosine top-10 over the embedding
    doc-values column (float64, oracle-comparable)."""
    import pyarrow.parquet as _pq
    from opensearch_ray.search import Searcher, dsl
    s = Searcher(_doc_index_vec(sf_dir), dtype=np.float64)
    qv = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        filters=[("vec_id", "=", 3)]
                        ).column("embedding").to_pylist()[0]
    out = dsl.execute_search(
        s, {"query": {"knn": {"embedding": {"vector": qv, "k": 10}}},
            "size": 10})
    out["score"] = _fmt(out["score"].values, 4)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["doc_id", "score", "rank"]]


def _q_knn_radial_query(sf_dir):
    """k-NN radial search (the plugin's min_score option / RNN query):
    every doc with cosine >= 0.2 of the query vector, score desc — k-less
    radius semantics, not a top-k."""
    import pyarrow.parquet as _pq
    from opensearch_ray.search import Searcher, dsl
    s = Searcher(_doc_index_vec(sf_dir), dtype=np.float64)
    qv = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        filters=[("vec_id", "=", 3)]
                        ).column("embedding").to_pylist()[0]
    out = dsl.execute_search(
        s, {"query": {"knn": {"embedding": {"vector": qv,
                                            "min_score": 0.2}}}})
    # max_distance is the same radius expressed as cosine distance
    out2 = dsl.execute_search(
        s, {"query": {"knn": {"embedding": {"vector": qv,
                                            "max_distance": 0.8}}}})
    assert out[["doc_id"]].equals(out2[["doc_id"]])
    out["score"] = _fmt(out["score"].values, 4)
    return out[["doc_id", "score"]]


def _q_knn_filtered_query(sf_dir):
    """Filtered kNN through the DSL (the k-NN plugin's `filter` option):
    lang='en' pre-filter — only allowed rows are gathered and scored,
    not a post-filter of the global top-k."""
    import pyarrow.parquet as _pq
    from opensearch_ray.search import Searcher, dsl
    s = Searcher(_doc_index_vec(sf_dir), dtype=np.float64)
    qv = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        filters=[("vec_id", "=", 3)]
                        ).column("embedding").to_pylist()[0]
    out = dsl.execute_search(
        s, {"query": {"knn": {"embedding": {
            "vector": qv, "k": 10,
            "filter": {"term": {"lang": "en"}}}}},
            "size": 10})
    out["score"] = _fmt(out["score"].values, 4)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["doc_id", "score", "rank"]]


def _q_wildcard_field(sf_dir):
    """wildcard FIELD query over keyword doc values: source matching
    'src1?' (src10..src19), one vectorized RE2 scan per segment."""
    from opensearch_ray.mapper import wildcard_field_docs
    s = _searcher(sf_dir)
    docs = wildcard_field_docs(s, "source", "src1?")
    return pd.DataFrame({"doc_id": np.sort(docs)})


def _q_ip_range_field(sf_dir):
    """ip_range FIELD type (RangeType.IP): per-row [lo, hi] IPv4 ranges
    vs a query CIDR, all three relations, uint32-space compare."""
    from opensearch_ray.mapper import ip_range_field_filter

    def derive(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        lo = [f"10.40.{int(e) % 128}.0" for e in eid]
        hi = [f"10.40.{int(e) % 128 + int(u) % 64}.255"
              for u, e in zip(uid, eid)]
        return pa.table({"event_id": t.column("event_id"),
                         "ip_lo": pa.array(lo, pa.string()),
                         "ip_hi": pa.array(hi, pa.string())})

    frames = []
    for rel in ("contains", "intersects", "within"):
        ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
            derive, batch_format="pyarrow")
        out = ip_range_field_filter(ds, "ip_lo", "ip_hi", "10.40.64.0/18",
                                    relation=rel).to_pandas()
        frames.append(pd.DataFrame(
            {"relation": rel,
             "event_id": np.sort(out["event_id"].values).astype(np.int64)}))
    return pd.concat(frames, ignore_index=True)


def _q_ip_cidr_term(sf_dir):
    """ip-field term query with a CIDR mask (10.96.0.0/12)."""
    from opensearch_ray.mapper import ip_term_filter

    def derive(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ips = [f"10.{int(u) % 256}.{int(e) % 256}.1"
               for u, e in zip(uid, eid)]
        return pa.table({"event_id": t.column("event_id"),
                         "ip": pa.array(ips, pa.string())})

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow")
    out = ip_term_filter(ds, "ip", "10.96.0.0/12").to_pandas()
    return (_typed(out, {"event_id": "int64"})
            .sort_values("event_id").reset_index(drop=True))


def _q_range_field_query(sf_dir):
    """range FIELD [value, value + user_id%10] vs query range [5, 12] under
    all three relations (RangeFieldMapper + RangeQueryBuilder.relation)."""
    from opensearch_ray.mapper import range_field_filter

    def derive(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({"event_id": t.column("event_id"),
                         "lo": pa.array(v, pa.float64()),
                         "hi": pa.array(v + (u % 10), pa.float64())})

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"]
               ).map_batches(derive, batch_format="pyarrow")
    parts = []
    for rel in ("intersects", "within", "contains"):
        out = _typed(range_field_filter(ds, "lo", "hi", 5.0, 12.0,
                                        rel).to_pandas(),
                     {"event_id": "int64"})
        parts.append(pd.DataFrame({"relation": rel,
                                   "event_id": out["event_id"]}))
    return (pd.concat(parts, ignore_index=True)
            .sort_values(["relation", "event_id"]).reset_index(drop=True))


def _q_scaled_float_agg(sf_dir):
    """scaled_float(l_tax, factor=10): stats over the QUANTIZED values —
    storage is Math.round(v*10) as long, queries see the decoded double."""
    from opensearch_ray.aggs.metrics import stats_agg
    from opensearch_ray.mapper import scaled_float_column
    ds = scaled_float_column(_read(sf_dir, "lineitem", ["l_tax"]),
                             "l_tax", 10.0)
    out = stats_agg(ds, "l_tax")
    for c in ("min", "max", "sum", "avg"):
        out[c] = _fmt(out[c].values, 4)
    return out


def _q_size_field(sf_dir):
    """_size metadata field (mapper-size plugin, SizeFieldMapper): UTF-8
    source byte length as a queryable long — range-filtered 400..600."""
    from opensearch_ray.mapper import size_column
    ds = size_column(_read(sf_dir, "documents", ["doc_id", "text", "lang"]),
                     ["text", "lang"])
    out = ds.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("_size"), pa.scalar(400)),
            pc.less_equal(t.column("_size"), pa.scalar(600)))),
        batch_format="pyarrow").to_pandas()
    return out[["doc_id", "_size"]].sort_values("doc_id") \
        .reset_index(drop=True)


def _q_annotated_text(sf_dir):
    """annotated_text field (plugins/mapper-annotated-text,
    AnnotatedTextFieldMapper): [covered](anno) wraps index the annotation
    as a keyword token at the covered span's first position. Each doc's
    first word is annotated ent{doc_id%5}&topic; term queries on the
    annotations resolve exactly."""
    import shutil
    import pyarrow.parquet as _pq
    from opensearch_ray.index.build import build_index
    from opensearch_ray.search import Searcher
    d = f"/tmp/osray_anno_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if not os.path.exists(os.path.join(d, "idx", "manifest.json")):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(os.path.join(d, "corpus"), exist_ok=True)
        t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]).sort_by("doc_id")
        dids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        ann = [f"[{s.split(' ', 1)[0]}](ent{i % 5}&topic) "
               f"{s.split(' ', 1)[1] if ' ' in s else ''}"
               for i, s in zip(dids, texts)]
        _pq.write_table(pa.table({"doc_id": t.column("doc_id"),
                                  "text": pa.array(ann, pa.string())}),
                        os.path.join(d, "corpus", "part-0.parquet"))
        build_index(os.path.join(d, "corpus"), os.path.join(d, "idx"),
                    analyzer="annotated_text", sort_cols=("doc_id",),
                    num_buckets=4)
    s = Searcher(os.path.join(d, "idx"))
    frames = []
    for term in ("ent3", "topic"):
        ids = s.term_docs(term)
        dids = s.fetch(ids.tolist(), columns=["doc_id"]).column(
            "doc_id").to_numpy(zero_copy_only=False)
        frames.append(pd.DataFrame(
            {"term": term, "doc_id": np.sort(dids).astype(np.int64)}))
    return pd.concat(frames, ignore_index=True)


def _q_copy_to_match(sf_dir):
    """copy_to mapping (FieldMapper.CopyTo): `lang`+`source`+`text` copied
    into one indexed `combined` field — a term query there matches docs
    where ANY source field carries the token."""
    import shutil
    from opensearch_ray.search.multifield import (MultiFieldSearcher,
                                                  build_multi_field_index)
    d = f"/tmp/osray_copyto_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if not os.path.exists(os.path.join(d, "fields.json")):
        shutil.rmtree(d, ignore_errors=True)
        build_multi_field_index(
            os.path.join(sf_dir, "documents.parquet"), d, fields=["text"],
            analyzer="transcript", sort_cols=("doc_id",),
            copy_to={"combined": ["lang", "source", "text"]})
    ms = MultiFieldSearcher(d)
    s = ms.searchers["combined"]
    frames = []
    for term in ("fr", "src3"):
        ids = s.term_docs(term)
        dids = s.fetch(ids.tolist(), columns=["doc_id"]).column(
            "doc_id").to_numpy(zero_copy_only=False)
        frames.append(pd.DataFrame(
            {"term": term, "doc_id": np.sort(dids).astype(np.int64)}))
    return pd.concat(frames, ignore_index=True)


def _q_unsigned_long_range(sf_dir):
    """unsigned_long field type (NumberFieldMapper.NumberType.UNSIGNED_LONG):
    values above int64 max stored as SHIFTED sortable longs; range filter +
    sort run in uint64 space. The column is derived as 2^64-1 - event_id so
    every value exceeds int64 max — the part a plain long field gets wrong."""
    from opensearch_ray.mapper import (unsigned_long_encode,
                                       unsigned_long_range_filter)
    U = (1 << 64) - 1
    ds = _read(sf_dir, "events", ["event_id"])

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        u = np.uint64(U) - eid.astype(np.uint64)
        return t.append_column("u", pa.array(u, pa.uint64()))

    ds = unsigned_long_range_filter(
        ds.map_batches(derive, batch_format="pyarrow"),
        "u", gte=U - 500, lt=U - 100)
    df = ds.to_pandas()  # bounded: range width caps this at 400 rows
    order = np.argsort(unsigned_long_encode(df["u"].values), kind="stable")
    df = df.iloc[order[:10]].reset_index(drop=True)
    df["u"] = df["u"].apply(str)
    return df[["event_id", "u"]]


def _q_token_count_range(sf_dir):
    """token_count field type: analyzed-token count as an integer doc value,
    range-queried 40..60."""
    from opensearch_ray.mapper import token_count_column
    ds = token_count_column(_read(sf_dir, "documents", ["doc_id", "text"]),
                            "text", analyzer="transcript")

    def filt(t: pa.Table) -> pa.Table:
        n = t.column("token_count").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((n >= 40) & (n <= 60)))

    out = ds.map_batches(filt, batch_format="pyarrow").to_pandas()
    return (out[["doc_id", "token_count"]].sort_values("doc_id")
            .reset_index(drop=True))


def _q_match_only_text(sf_dir):
    """match_only_text field type: index_options=DOCS + no norms, so each
    matched term contributes exactly boost*idf (tf and length factors
    collapse to 1) — score = Σ idf over matched query terms."""
    from opensearch_ray.mapper import match_only_text_query
    s = _searcher(sf_dir)
    docs, scores = match_only_text_query(s, _BM25_Q)
    return pd.DataFrame({"doc_id": docs.astype(np.int64),
                         "score": _fmt(scores, 4)})


def _q_constant_keyword(sf_dir):
    """constant_keyword: a term query equal to the mapping value rewrites
    to match_all WITHOUT reading data; any other value to match_none."""
    from opensearch_ray.mapper import constant_keyword_filter
    ds = _read(sf_dir, "documents", ["doc_id"])
    hit = constant_keyword_filter(ds, "corpus", "corpus").to_pandas()
    miss = constant_keyword_filter(_read(sf_dir, "documents", ["doc_id"]),
                                   "corpus", "other")
    assert miss.count() == 0
    return hit.sort_values("doc_id").reset_index(drop=True)


def _q_flat_object_term(sf_dir):
    """flat_object over events.props JSON: term query on the dynamic leaf
    path `k` (keyword semantics, no explicit mapping)."""
    from opensearch_ray.mapper import flat_object_term_filter
    out = flat_object_term_filter(
        _read(sf_dir, "events", ["event_id", "props"]),
        "props", "k", "69").to_pandas()
    return out[["event_id"]].sort_values("event_id").reset_index(drop=True)


def _completion_index(sf_dir, with_context: bool):
    from opensearch_ray.search.completion import CompletionIndex
    cols = ["text", "lang"] if with_context else ["text"]
    return CompletionIndex.build(
        _read(sf_dir, "documents", cols), "text",
        context_col="lang" if with_context else None,
        analyzer="transcript")


def _q_completion_context(sf_dir):
    """completion suggester with category contexts: suggestions filtered
    to docs whose lang context is en or de, weights summed over the
    surviving contexts (ContextMappings category filter)."""
    ci = _completion_index(sf_dir, with_context=True)
    return ci.complete("s", size=5, contexts=["en", "de"])


def _q_completion_fuzzy(sf_dir):
    """fuzzy completion (FuzzyOptions): 'strem' matches terms whose prefix
    is within 1 edit — finds 'stream' despite the typo."""
    ci = _completion_index(sf_dir, with_context=False)
    return ci.complete("strem", size=5, fuzzy_edits=1)


def _q_agg_reverse_nested(sf_dir):
    """reverse_nested: bucket by CHILD l_returnflag, count PARENT orders."""
    from opensearch_ray.nested import nest_children, reverse_nested_agg
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    nested = nest_children(orders, items, "o_orderkey", "l_orderkey",
                           ["l_orderkey", "l_returnflag"], list_col="items")
    out = (reverse_nested_agg(nested, "items", "l_returnflag", "o_orderkey")
           .to_pandas().sort_values("l_returnflag").reset_index(drop=True))
    return out[["l_returnflag", "doc_count"]]


def _q_agg_global(sf_dir):
    """global agg: query-scoped (l_returnflag='A') vs global avg price."""
    from opensearch_ray.aggs.bucket import global_agg
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    out = global_agg(ds, lambda t: pc.equal(t.column("l_returnflag"), "A"),
                     "l_extendedprice")
    out["avg"] = _fmt(out["avg"].values, 4)
    return out


def _q_agg_filter(sf_dir):
    """filter single-bucket agg: doc_count + sum/avg inside the bucket."""
    from opensearch_ray.aggs.bucket import filter_agg
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = filter_agg(ds, lambda t: pc.equal(t.column("l_returnflag"), "R"),
                     "l_quantity")
    out["sum"] = _fmt(out["sum"].values, 2)
    out["avg"] = _fmt(out["avg"].values, 4)
    return out


def _q_common_terms(sf_dir):
    """common terms query: 'dup' is low-frequency (df<=100) and gates; the
    stopword-like 'scan'/'batch' only contribute score on gated docs."""
    from opensearch_ray.search.features import common_terms_query
    s = _searcher(sf_dir)
    out = common_terms_query(s, "dup scan batch", cutoff_df=100, k=10)
    out = out.rename(columns={"_docid": "doc_id"})
    out["score"] = _fmt(out["score"].values, 4)
    return out


def _q_geo_shape(sf_dir):
    """geo_shape envelope query with intersects AND disjoint relations
    (point docs: the two partitions of the corpus)."""
    from opensearch_ray.aggs.geo import geo_shape_filter
    shape = {"type": "envelope",
             "coordinates": [[-60.3, 35.7], [20.1, -25.9]]}
    parts = []
    for rel in ("intersects", "disjoint"):
        out = _typed(geo_shape_filter(_geo_events(sf_dir), "lat", "lon",
                                      shape, relation=rel).to_pandas(),
                     {"event_id": "int64"})
        parts.append(pd.DataFrame({"relation": rel,
                                   "event_id": out["event_id"]}))
    return (pd.concat(parts, ignore_index=True)
            .sort_values(["relation", "event_id"]).reset_index(drop=True))


_GEO_POLY = [(0.1, -44.9), (-29.8, 0.3), (0.2, 45.7), (30.3, 0.1)]


def _q_geo_polygon(sf_dir):
    """geo_polygon filter: events inside a convex quad (CCW vertices)."""
    from opensearch_ray.aggs.geo import geo_polygon_filter
    out = geo_polygon_filter(_geo_events(sf_dir), "lat", "lon",
                             _GEO_POLY).to_pandas()
    return (_typed(out, {"event_id": "int64"})
            .sort_values("event_id").reset_index(drop=True))


def _q_dsl_search(sf_dir):
    """Full JSON `_search` request body through the query-DSL executor
    (search/dsl.py): bool must(match) + filter(range) + must_not(term),
    _source projection — the reference's actual API surface
    (SearchSourceBuilder + AbstractQueryBuilder.parseInnerQueryBuilder)."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    body = {"query": {"bool": {
                "must": [{"match": {"text": _BM25_Q}}],
                "filter": [{"range": {"n_chars": {"gte": 200}}}],
                "must_not": [{"term": {"text": "merge"}}]}},
            "size": 10, "_source": ["lang"]}
    r = dsl.execute_search(s, body)
    r["score"] = _fmt(r["score"].values, 4)
    return r


def _q_dsl_search_after_score(sf_dir):
    """Request-body `search_after` with the implicit (_score desc, _doc
    asc) order: page 1 yields the [last_score, last_docid] cursor, page 2
    rides the collector's after= floor on the DSL fast path (O(k) heap at
    any depth). Reference: search/searchafter/SearchAfterBuilder.java."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    body = {"query": {"match": {"text": _BM25_Q}}, "size": 10}
    p1 = dsl.execute_search(s, body)
    cursor = [float(p1["score"].iloc[-1]), int(p1["doc_id"].iloc[-1])]
    p2 = dsl.execute_search(s, {**body, "search_after": cursor})
    p2["score"] = _fmt(p2["score"].values, 4)
    return p2


def _q_dsl_search_after_sort(sf_dir):
    """Request-body `search_after` under an explicit field sort
    (n_chars desc, _doc asc tiebreak): the general path's sort-tuple
    strictly-after mask. Reference: SearchAfterBuilder.java +
    sort/FieldSortBuilder.java."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    body = {"query": {"match": {"text": _BM25_Q}},
            "sort": [{"n_chars": "desc"}, {"_doc": "asc"}],
            "size": 10, "_source": ["n_chars"]}
    p1 = dsl.execute_search(s, body)
    cursor = [int(p1["n_chars"].iloc[-1]), int(p1["doc_id"].iloc[-1])]
    p2 = dsl.execute_search(s, {**body, "search_after": cursor})
    p2["score"] = _fmt(p2["score"].values, 4)
    return p2


def _q_derived_field_query(sf_dir):
    """Derived (query-time computed) field — DerivedFieldMapper /
    DerivedFieldQuery.java: a request-body `derived` definition makes
    chars_bucket = n_chars // 100 a first-class doc-values column; the
    range query, the field sort and the value gather all run on it."""
    from opensearch_ray.search import dsl
    from opensearch_ray.search.sort_phase import gather_doc_values
    s = _searcher(sf_dir)
    body = {"derived": {"chars_bucket": {"script": {
                "source": lambda df: (df["n_chars"].values // 100)
                                     .astype(np.int64),
                "fields": ["n_chars"]}}},
            "query": {"range": {"chars_bucket": {"gte": 2, "lte": 3}}},
            "sort": [{"chars_bucket": "asc"}, "_doc"], "size": 20}
    r = dsl.execute_request(s, body)
    ids = r["hits"]["doc_id"].to_numpy(np.int64)
    return pd.DataFrame({
        "doc_id": ids,
        "chars_bucket": gather_doc_values(s, ids, "chars_bucket")
                        .astype(np.int64)})


def _q_sort_index_early_term(sf_dir):
    """Index-sort early termination (IndexSortConfig +
    QueryPhase.canEarlyTerminate): the documents index is built sorted by
    doc_id, so a (doc_id asc) sorted match collects only k docs per
    segment through a row-group-pruned prefix read. Asserted identical to
    the full gather-and-sort path, then oracle-checked."""
    s = _searcher(sf_dir)
    assert s.manifest.index_sort[:1] == ["doc_id"]
    fast = s.search_sorted("hash", "doc_id", k=12, early_terminate=True)
    full = s.search_sorted("hash", "doc_id", k=12, early_terminate=False)
    assert fast.equals(full)
    out = pd.DataFrame({"doc_id": fast["_docid"].astype(np.int64)})
    return out


def _q_ltr_rescore(sf_dir):
    """Learning-to-rank rescore (the opensearch-learning-to-rank plugin's
    sltr query): linear model 0.6*bm25 + 0.0005*n_chars over the base
    query's top-50 window, re-ranked top 10 — window discipline, feature
    extraction and model scoring all oracle-checked."""
    from opensearch_ray.search.ltr import ltr_rescore
    s = _searcher(sf_dir)
    out, feats = ltr_rescore(
        s, _BM25_Q,
        feature_set={"bm25": {"bm25": _BM25_Q},
                     "chars": {"field": "n_chars"}},
        weights={"bm25": 0.6, "chars": 0.0005},
        window_size=50, k=10, log_features=True)
    assert list(feats.columns) == ["_docid", "bm25", "chars"]
    out = out.rename(columns={"_docid": "doc_id"})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["ltr_score"] = _fmt(out["ltr_score"].values, 4)
    return out


def _q_dsl_count(sf_dir):
    """`_count` with a request body (RestCountAction): bool filter-context
    count, no scoring or fetch."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    n = dsl.count_request(s, {"query": {"bool": {
        "must": [{"match": {"text": _BM25_Q}}],
        "filter": [{"range": {"n_chars": {"gte": 200}}}],
        "must_not": [{"term": {"lang": "zh"}}]}}})
    return pd.DataFrame({"count": pd.array([n], dtype="int64")})


def _q_field_alias_search(sf_dir):
    """`alias`-type field resolution (FieldAliasMapper.java): a request
    written entirely against alias names — range + term filters, field
    sort — resolves to the concrete columns before execution; `_source`
    stays concrete (source filtering never sees aliases)."""
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    aliases = {"chars": "n_chars", "language": "lang", "body_text": "text"}
    body = {"query": {"bool": {
                "filter": [{"range": {"chars": {"gte": 200, "lt": 400}}},
                           {"term": {"language": "en"}}]}},
            "sort": [{"chars": "asc"}, "_doc"],
            "size": 15, "_source": ["n_chars", "lang"]}
    r = dsl.execute_request(s, body, field_aliases=aliases)
    hits = r["hits"][["doc_id", "n_chars", "lang"]].reset_index(drop=True)
    hits["doc_id"] = hits["doc_id"].astype(np.int64)
    hits["n_chars"] = hits["n_chars"].astype(np.int64)
    return hits


def _q_wrapper_query(sf_dir):
    """wrapper query (WrapperQueryBuilder.java): base64-encoded JSON query
    decoded and executed in filter context."""
    import base64
    import json as _json
    from opensearch_ray.search import dsl
    s = _searcher(sf_dir)
    inner = {"bool": {"must": [{"term": {"text": "window"}}],
                      "filter": [{"range": {"n_chars": {"lt": 400}}}]}}
    q = {"wrapper": {"query": base64.b64encode(
        _json.dumps(inner).encode()).decode()}}
    return pd.DataFrame({"doc_id": dsl.query_docs(s, q)})


_SEARCH_TPL = (
    '{"query": {"bool": {"must": [{"match": {"text": "{{qtext}}"}}]'
    '{{#lang}}, "filter": [{"term": {"lang": "{{lang}}"}}]{{/lang}}}},'
    ' "size": {{size}}}')


def _q_search_template(sf_dir):
    """Mustache search template (lang-mustache MustacheScriptEngine +
    TransportSearchTemplateAction): render params into a request body, then
    execute through the DSL executor. The {{#lang}} section exercises
    conditional blocks."""
    from opensearch_ray.search import dsl
    from opensearch_ray.search.templates import render_search_template
    s = _searcher(sf_dir)
    body = render_search_template(
        _SEARCH_TPL, {"qtext": "window sort", "lang": "en", "size": 10})
    r = dsl.execute_search(s, body)
    r["score"] = _fmt(r["score"].values, 4)
    return r


def _rankeval_requests(s):
    """Two rated requests with data-derived graded ratings: for query terms
    (a, b), every doc containing a or b is rated — 2 when both present,
    1 when only a, 0 when only b (unlabeled otherwise)."""
    def ratings(a, b):
        da = set(s.term_docs(a).tolist())
        db = set(s.term_docs(b).tolist())
        return {d: (2 if (d in da and d in db) else (1 if d in da else 0))
                for d in da | db}
    return [
        {"id": "q_hash", "query_text": "hash join",
         "ratings": ratings("hash", "join")},
        {"id": "q_ws", "query_text": "window sort",
         "ratings": ratings("window", "sort")},
    ]


def _q_rank_eval_precision(sf_dir):
    """_rank_eval with precision@10 (rank-eval module PrecisionAtK.java:
    relevant-retrieved / retrieved, unlabeled hits counted)."""
    from opensearch_ray.rankeval import rank_eval
    s = _searcher(sf_dir)
    df = rank_eval(s, _rankeval_requests(s), metric="precision", k=10)
    df["metric_score"] = _fmt(df["metric_score"].values, 4)
    return df


def _q_rank_eval_ndcg(sf_dir):
    """_rank_eval with NDCG@10 (DiscountedCumulativeGain.java normalize=true:
    ideal DCG over all rated docs truncated to the hit-list length)."""
    from opensearch_ray.rankeval import rank_eval
    s = _searcher(sf_dir)
    df = rank_eval(s, _rankeval_requests(s), metric="dcg", k=10)
    df["metric_score"] = _fmt(df["metric_score"].values, 4)
    return df


def entry() -> Any:
    """Flagship: transcript corpus -> inverted index -> reference query set."""
    from opensearch_ray.pipelines import flagship_pipeline
    return flagship_pipeline(work_dir="/tmp/osray_flagship", n_turns=2000,
                             n_files=4)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # index / search core
        "analyze_tokens": _q_analyze_tokens,
        "doc_lengths": _q_doc_lengths,
        "term_stats": _q_term_stats,
        "bm25_match_docs": _q_bm25_match_docs,
        "bm25_topk": _q_bm25_topk,
        "bm25_and": _q_bm25_and,
        "sim_boolean": _q_similarity("boolean"),
        "sim_lm_dirichlet": _q_similarity("lm_dirichlet"),
        "sim_lm_jelinek_mercer": _q_similarity("lm_jelinek_mercer"),
        "sim_dfi": _q_similarity("dfi"),
        "sim_scripted": _q_sim_scripted,
        "term_query": _q_term_query,
        "bool_query": _q_bool_query,
        "phrase_query": _q_phrase_query,
        # aggregations
        "agg_terms": _q_agg_terms,
        "agg_multi_terms": _q_agg_multi_terms,
        "agg_stats": _q_agg_stats,
        "agg_extended_stats": _q_agg_extended_stats,
        "agg_value_count": _q_agg_value_count,
        "agg_weighted_avg": _q_agg_weighted_avg,
        "agg_cardinality": _q_agg_cardinality,
        "agg_date_histogram": _q_agg_date_histogram,
        "agg_histogram": _q_agg_histogram,
        "agg_range": _q_agg_range,
        "agg_composite": _q_agg_composite,
        "agg_top_hits": _q_agg_top_hits,
        "agg_matrix_stats": _q_agg_matrix_stats,
        "scripted_metric": _q_scripted_metric,
        "agg_cumulative_sum": _q_agg_cumulative_sum,
        "agg_derivative": _q_agg_derivative,
        # sort / top-k / collapse
        "sort_page2": _q_sort_page2,
        "sort_field_missing": _q_sort_field_missing,
        "sort_nested_field": _q_sort_nested_field,
        "sort_script_page": _q_sort_script_page,
        "sort_geo_distance": _q_sort_geo_distance,
        "fetch_source_filter": _q_fetch_source_filter,
        "fetch_docvalue_fields": _q_fetch_docvalue_fields,
        "fetch_script_fields": _q_fetch_script_fields,
        "collapse": _q_collapse,
        "function_score": _q_function_score,
        # ingest processors
        "ingest_pipeline": _q_ingest_pipeline,
        "ingest_kv": _q_ingest_grok,
        # training-data ops
        "dedup_exact": _q_dedup_exact,
        "dedup_cluster_keep_best": _q_dedup_cluster_keep_best,
        "dedup_minhash_clusters": _q_dedup_minhash_clusters,
        "token_count": _q_token_count,
        "quality_scores": _q_quality,
        "c4_quality_signals": _q_c4_quality_signals,
        "bulk_ndjson_source": _q_bulk_ndjson_source,
        "lm_quality": _q_lm_quality,
        "dsir_logweight": _q_dsir_logweight,
        "analyze_custom_chain": _q_analyze_custom_chain,
        "fingerprint": _q_fingerprint,
        "ann_cosine_topk": _q_ann_brute,
        "hybrid_rrf": _q_hybrid_rrf,
        "hybrid_normalized": _q_hybrid_normalized,
        "dsl_hybrid_query": _q_dsl_hybrid_query,
        "term_case_insensitive": _q_term_case_insensitive,
        "neural_sparse": _q_neural_sparse,
        "function_score_random": _q_function_score_random,
        "dedup_lines": _q_dedup_lines,
        "agg_ip_prefix": _q_agg_ip_prefix,
        # joins / windows / search features
        "asof_join": _q_asof_join,
        "hash_join": _q_hash_join,
        "window_tumbling": _q_window_tumbling,
        "window_sliding": _q_window_sliding,
        "window_session": _q_window_session,
        "collapse_bm25_by_lang": _q_collapse_bm25_by_lang,
        "alias_filtered_search": _q_alias_filtered_search,
        "bm25_filtered": _q_bm25_filtered,
        "prefix_query": _q_prefix_query,
        "completion_suggest": _q_completion,
        "field_sort": _q_field_sort,
        "query_terms_agg": _q_query_terms_agg,
        "agg_adjacency_matrix": _q_agg_adjacency,
        "agg_significant_terms": _q_agg_significant_terms,
        "sig_scripted": _q_sig_scripted,
        "agg_sig_chi_square": _q_agg_sig_chi_square,
        "agg_sig_mutual_info": _q_agg_sig_mutual_info,
        "agg_sig_gnd": _q_agg_sig_gnd,
        "agg_sig_percentage": _q_agg_sig_percentage,
        "wildcard_query": _q_wildcard_query,
        "fuzzy_query": _q_fuzzy_query,
        "fuzzy_transpositions": _q_fuzzy_transpositions,
        "dedup_remove_spans": _q_dedup_remove_spans,
        "nb_classifier": _q_nb_classifier,
        "bpe_token_count": _q_bpe_token_count,
        "term_suggester": _q_term_suggester,
        "function_score_decay": _q_function_score_decay,
        "terms_lookup": _q_terms_lookup,
        "search_after": _q_search_after,
        "agg_moving_avg": _q_agg_moving_avg,
        "agg_moving_avg_ewma": _q_agg_moving_avg_ewma,
        "agg_moving_percentiles": _q_agg_moving_percentiles,
        "agg_moving_avg_linear": _q_agg_moving_avg_linear,
        "geo_shape_docs": _q_geo_shape_docs,
        "agg_serial_diff": _q_agg_serial_diff,
        "agg_rare_terms": _q_agg_rare_terms,
        "agg_filters": _q_agg_filters,
        "agg_bucket_selector": _q_agg_bucket_selector,
        "search_as_you_type": _q_search_as_you_type,
        "agg_percentiles_bucket": _q_agg_percentiles_bucket,
        "agg_extended_stats_bucket": _q_agg_extended_stats_bucket,
        "agg_max_bucket": _q_agg_max_bucket,
        "multi_match": _q_multi_match,
        "multi_match_cross_fields": _q_multi_match_cross,
        "multi_match_phrase": _q_multi_match_phrase,
        "dis_max_query": _q_dis_max,
        "boosting_query": _q_boosting,
        "query_string": _q_query_string,
        "phrase_suggest": _q_phrase_suggest,
        "agg_date_range": _q_agg_date_range,
        "agg_sampler": _q_agg_sampler,
        "agg_diversified_sampler": _q_agg_diversified_sampler,
        "agg_significant_text": _q_agg_significant_text,
        "multi_index_union": _q_multi_index,
        "indices_boost": _q_indices_boost,
        "post_filter": _q_post_filter,
        "min_score": _q_min_score,
        "matched_queries": _q_matched_queries,
        "agg_geo_bounds": _q_agg_geo_bounds,
        "nested_query": _q_nested_query,
        "nested_agg": _q_nested_agg,
        "has_child_query": _q_has_child,
        "agg_children": _q_agg_children,
        "agg_parent": _q_agg_parent,
        "has_child_score": _q_has_child_score,
        "has_parent_query": _q_has_parent,
        "parent_id_query": _q_parent_id,
        "has_child_inner_hits": _q_has_child_inner_hits,
        "nested_inner_hits": _q_nested_inner_hits,
        "collapse_inner_hits": _q_collapse_inner_hits,
        "percolate": _q_percolate,
        "agg_geo_distance": _q_agg_geo_distance,
        "agg_geo_centroid": _q_agg_geo_centroid,
        "agg_geotile_grid": _q_agg_geotile_grid,
        "agg_geohash_grid": _q_agg_geohash_grid,
        "span_near_query": _q_span_near,
        "span_near_unordered": _q_span_near_unordered,
        "span_or_query": _q_span_or,
        "span_first_query": _q_span_first,
        "span_not_query": _q_span_not,
        "span_containing_query": _q_span_containing,
        "intervals_query": _q_intervals,
        "intervals_any_of": _q_intervals_any_of,
        "intervals_all_of_gaps": _q_intervals_all_of_gaps,
        "span_gap_near": _q_span_gap_near,
        "intervals_filter": _q_intervals_filter,
        "intervals_prefix_combine": _q_intervals_prefix_combine,
        "agg_auto_date_histogram": _q_agg_auto_date_histogram,
        "exists_query": _q_exists,
        "terms_set_query": _q_terms_set,
        "regexp_query": _q_regexp,
        "match_bool_prefix": _q_match_bool_prefix,
        "ids_query": _q_ids,
        "constant_score_query": _q_constant_score,
        "simple_query_string": _q_simple_query_string,
        "distance_feature": _q_distance_feature,
        "script_score": _q_script_score,
        "span_multi_query": _q_span_multi,
        "field_masking_span": _q_field_masking_span,
        "highlight_unified": _q_highlight_unified,
        "highlight_fvh": _q_highlight_fvh,
        "agg_ip_range": _q_agg_ip_range,
        "geo_distance_query": _q_geo_distance_query,
        "geo_bounding_box": _q_geo_bounding_box,
        "rank_feature": _q_rank_feature,
        "agg_variable_width_histogram": _q_agg_vwh,
        "range_query": _q_range_query,
        "bm25_range_filtered": _q_bm25_range_filtered,
        "phrase_slop": _q_phrase_slop,
        "highlight": _q_highlight,
        # rows-only (non-SQL-expressible)
        "langid": _q_langid,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_dedup": _q_embed_dedup,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_hnsw_topk": _q_ann_hnsw,
        "ann_pq_topk": _q_ann_pq,
        "ann_ivfpq_topk": _q_ann_ivfpq,
        "cardinality_hll": _q_cardinality_hll,
        "percentiles_tdigest": _q_percentiles_tdigest,
        "agg_percentile_ranks": _q_agg_percentile_ranks,
        "agg_percentiles_hdr": _q_agg_percentiles_hdr,
        "agg_percentile_ranks_hdr": _q_agg_percentile_ranks_hdr,
        "multimodal_features": _q_multimodal,
        "phash_dedup": _q_phash_dedup,
        "transcript_flagship": _q_transcript_flagship,
        "training_data_pipeline": _q_training_data_pipeline,
        # round-3 session 2: reference-surface tail
        "dsl_request_aggs": _q_dsl_request_aggs,
        "dsl_agg_hist_range_card": _q_dsl_agg_hist_range_card,
        "dsl_agg_terms_sub": _q_dsl_agg_terms_sub,
        "dsl_agg_calendar_pct": _q_dsl_agg_calendar_pct,
        "fetch_docvalue_format": _q_fetch_docvalue_format,
        "agg_terms_partition": _q_agg_terms_partition,
        "agg_composite_hist": _q_agg_composite_hist,
        "agg_composite_geotile": _q_agg_composite_geotile,
        "dedup_substring_stats": _q_dedup_substring_stats,
        "stratified_sample": _q_stratified_sample,
        "pack_sequences": _q_pack_sequences,
        "semantic_dedup": _q_semantic_dedup,
        "decontaminate": _q_decontaminate,
        "termvectors": _q_termvectors,
        "mtermvectors": _q_mtermvectors,
        "rank_features_query": _q_rank_features_query,
        "murmur3_field": _q_murmur3_field,
        "normalizer_term": _q_normalizer_term,
        "agg_percentiles_hdr_price": _q_agg_percentiles_hdr_price,
        "agg_terms_order": _q_agg_terms_order,
        "field_caps": _q_field_caps,
        "validate_query": _q_validate_query,
        "agg_significant_text_dedup": _q_agg_significant_text_dedup,
        "agg_composite_sub": _q_agg_composite_sub,
        "repetition_stats": _q_repetition_stats,
        "pii_redact": _q_pii_redact,
        "date_math_range": _q_date_math_range,
        "knn_query": _q_knn_query,
        "knn_radial_query": _q_knn_radial_query,
        "knn_filtered_query": _q_knn_filtered_query,
        "wildcard_field_query": _q_wildcard_field,
        "ip_cidr_term": _q_ip_cidr_term,
        "ip_range_field": _q_ip_range_field,
        "range_field_query": _q_range_field_query,
        "scaled_float_agg": _q_scaled_float_agg,
        "token_count_range": _q_token_count_range,
        "unsigned_long_range": _q_unsigned_long_range,
        "copy_to_match": _q_copy_to_match,
        "annotated_text_term": _q_annotated_text,
        "size_field": _q_size_field,
        "match_only_text_query": _q_match_only_text,
        "constant_keyword_term": _q_constant_keyword,
        "flat_object_term": _q_flat_object_term,
        "completion_suggest_context": _q_completion_context,
        "completion_suggest_fuzzy": _q_completion_fuzzy,
        "agg_reverse_nested": _q_agg_reverse_nested,
        "agg_global": _q_agg_global,
        "agg_filter": _q_agg_filter,
        "common_terms_query": _q_common_terms,
        "geo_polygon": _q_geo_polygon,
        "geo_shape_query": _q_geo_shape,
        # JSON DSL executor / templates / rank-eval
        "dsl_search": _q_dsl_search,
        "dsl_search_after_score": _q_dsl_search_after_score,
        "dsl_search_after_sort": _q_dsl_search_after_sort,
        "field_alias_search": _q_field_alias_search,
        "ltr_rescore": _q_ltr_rescore,
        "dsl_count": _q_dsl_count,
        "sort_index_early_term": _q_sort_index_early_term,
        "derived_field_query": _q_derived_field_query,
        "wrapper_query": _q_wrapper_query,
        "search_template": _q_search_template,
        "rank_eval_precision": _q_rank_eval_precision,
        "rank_eval_ndcg": _q_rank_eval_ndcg,
    }


def oracle_sql() -> dict[str, str]:
    STOP = _stop_sql()
    return {
        "analyze_tokens": f"""
            SELECT d.doc_id, t.tok AS token
            FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok <> '' AND t.tok NOT IN {STOP}
        """,
        "doc_lengths": f"""
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '),
                       x -> x <> '' AND x NOT IN {STOP})) AS dl
            FROM documents
        """,
        "term_stats": f"""
            SELECT t.tok AS token, count(DISTINCT d.doc_id) AS df, count(*) AS ttf
            FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok <> '' AND t.tok NOT IN {STOP}
            GROUP BY t.tok
        """,
        "bm25_match_docs": _bm25_sql(
            "SELECT doc_id, printf('%.4f', score) AS score FROM scored"),
        "bm25_topk": _bm25_sql(
            """SELECT doc_id,
                      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
                      printf('%.4f', score) AS score
               FROM scored ORDER BY score DESC, doc_id LIMIT 10"""),
        "bm25_and": _bm25_sql(
            """SELECT doc_id, printf('%.4f', score) AS score FROM scored
               WHERE doc_id IN (
                 SELECT doc_id FROM tf WHERE token = 'hash'
                 INTERSECT SELECT doc_id FROM tf WHERE token = 'join')""",
            query_terms=["hash", "join"]),
        **{f"sim_{s}": _sim_sql(
            s,
            """SELECT doc_id,
                      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
                      printf('%.4f', score) AS score
               FROM scored ORDER BY score DESC, doc_id LIMIT 10""")
           for s in ("boolean", "lm_dirichlet", "lm_jelinek_mercer", "dfi",
                     "scripted")},
        "agg_significant_terms": """
            WITH per_key AS (
              SELECT event_type,
                     CAST(sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS fg,
                     count(*) AS bg
              FROM events GROUP BY event_type),
            tot AS (SELECT CAST(sum(fg) AS DOUBLE) AS n_fg,
                           CAST(sum(bg) AS DOUBLE) AS n_bg FROM per_key),
            scored AS (
              SELECT p.event_type, p.fg, p.bg,
                     CASE WHEN p.fg / t.n_fg > p.bg / t.n_bg
                          THEN (p.fg / t.n_fg - p.bg / t.n_bg)
                               * ((p.fg / t.n_fg)
                                  / greatest(p.bg / t.n_bg, 1e-9))
                          ELSE 0.0 END AS score
              FROM per_key p CROSS JOIN tot t)
            SELECT event_type, fg, bg, printf('%.6f', score) AS score
            FROM scored WHERE score > 0
            ORDER BY scored.score DESC, event_type LIMIT 10
        """,
        "sig_scripted": """
            WITH per_key AS (
              SELECT event_type,
                     CAST(sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS fg,
                     count(*) AS bg
              FROM events GROUP BY event_type),
            tot AS (SELECT CAST(sum(fg) AS DOUBLE) AS n_fg,
                           CAST(sum(bg) AS DOUBLE) AS n_bg FROM per_key),
            scored AS (
              SELECT p.event_type, p.fg, p.bg,
                     (p.fg / t.n_fg)
                     / greatest(p.bg / t.n_bg, 1e-12) AS score
              FROM per_key p CROSS JOIN tot t)
            SELECT event_type, fg, bg, printf('%.6f', score) AS score
            FROM scored WHERE score > 0
            ORDER BY scored.score DESC, event_type LIMIT 10
        """,
        "agg_percentiles_hdr": """
            WITH c AS (SELECT l_quantity AS v, count(*) AS cnt
                       FROM lineitem GROUP BY 1),
            t AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
                         (SELECT count(*) FROM lineitem) AS n FROM c)
            SELECT (SELECT min(v) FROM t WHERE cum >= greatest(1, ceil(0.25 * n))) AS p25,
                   (SELECT min(v) FROM t WHERE cum >= greatest(1, ceil(0.50 * n))) AS p50,
                   (SELECT min(v) FROM t WHERE cum >= greatest(1, ceil(0.95 * n))) AS p95
        """,
        "agg_percentile_ranks_hdr": """
            SELECT (100.0 * sum(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END))
                     / count(*) AS rank_10,
                   (100.0 * sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END))
                     / count(*) AS rank_25,
                   (100.0 * sum(CASE WHEN l_quantity <= 40 THEN 1 ELSE 0 END))
                     / count(*) AS rank_40
            FROM lineitem
        """,
        "agg_sig_chi_square": _sig_nxy_sql("""
            CASE WHEN n11 / n_1 < n10 / n_0 THEN -1.0
                 ELSE n * pow(n11 * n00 - n01 * n10, 2.0)
                      / greatest(n_1 * n1_ * n0_ * n_0, 1e-12) END"""),
        "agg_sig_mutual_info": _sig_nxy_sql("""
            CASE WHEN n11 / n_1 < n10 / n_0 THEN -1.0 ELSE
            (CASE WHEN abs(n * n00) < 1e-7 AND abs(n00 / n) < 1e-7 THEN 0.0
                  ELSE abs(n00 / n) * ln(abs(n * n00) / abs(n0_ * n_0)) END
             + CASE WHEN abs(n * n01) < 1e-7 AND abs(n01 / n) < 1e-7 THEN 0.0
                  ELSE abs(n01 / n) * ln(abs(n * n01) / abs(n0_ * n_1)) END
             + CASE WHEN abs(n * n10) < 1e-7 AND abs(n10 / n) < 1e-7 THEN 0.0
                  ELSE abs(n10 / n) * ln(abs(n * n10) / abs(n1_ * n_0)) END
             + CASE WHEN abs(n * n11) < 1e-7 AND abs(n11 / n) < 1e-7 THEN 0.0
                  ELSE abs(n11 / n) * ln(abs(n * n11) / abs(n1_ * n_1)) END
            ) / ln(2.0) END"""),
        "agg_sig_gnd": _sig_nxy_sql("""
            CASE WHEN n11 = 0 THEN 0.0
                 WHEN n1_ = n_1 AND n1_ = n11 THEN 1.0
                 ELSE exp(-1.0 * (greatest(ln(n1_), ln(n_1)) - ln(n11))
                          / greatest(ln(n) - least(ln(n1_), ln(n_1)),
                                     1e-12)) END"""),
        "agg_sig_percentage": _sig_nxy_sql(
            "CASE WHEN bg = 0 THEN 0.0 ELSE n11 / n1_ END"),
        "agg_adjacency_matrix": """
            SELECT key, doc_count FROM (
              SELECT 'big' AS key, count(*) AS doc_count FROM events
              WHERE value > 150.0
              UNION ALL
              SELECT 'big&err', count(*) FROM events
              WHERE value > 150.0 AND event_type = 'error'
              UNION ALL
              SELECT 'err', count(*) FROM events WHERE event_type = 'error'
            ) WHERE doc_count > 0 ORDER BY key
        """,
        "query_terms_agg": f"""
            WITH tok AS (
              SELECT d.doc_id, t.tok AS token FROM documents d,
                     unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}),
            hits AS (
              SELECT DISTINCT doc_id FROM tok
              WHERE token IN ('hash', 'join', 'stream'))
            SELECT d.lang, count(*) AS doc_count
            FROM documents d JOIN hits USING (doc_id)
            GROUP BY d.lang ORDER BY doc_count DESC, d.lang LIMIT 10
        """,
        "field_sort": """
            SELECT DISTINCT d.doc_id, d.n_chars FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok = 'hash'
            ORDER BY d.n_chars DESC, d.doc_id LIMIT 10
        """,
        "completion_suggest": f"""
            SELECT token AS term, df,
                   CAST(row_number() OVER (ORDER BY df DESC, token) AS BIGINT)
                     AS rank
            FROM (
              SELECT t.tok AS token, count(DISTINCT d.doc_id) AS df
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok LIKE 's%' AND t.tok <> '' AND t.tok NOT IN {STOP}
              GROUP BY t.tok)
            ORDER BY df DESC, token LIMIT 8
        """,
        "prefix_query": f"""
            SELECT DISTINCT doc_id FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok LIKE 'ha%' AND t.tok NOT IN {STOP} AND t.tok <> ''
        """,
        "wildcard_query": f"""
            SELECT DISTINCT doc_id FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok LIKE 's%am' AND t.tok NOT IN {STOP} AND t.tok <> ''
        """,
        "fuzzy_query": f"""
            SELECT DISTINCT doc_id FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE levenshtein(t.tok, 'hashe') <= 1
              AND t.tok NOT IN {STOP} AND t.tok <> ''
        """,
        "langid": """
            WITH prof(lg, w) AS (VALUES
              ('en','and'),('en','for'),('en','in'),('en','is'),('en','it'),
              ('en','of'),('en','that'),('en','the'),('en','to'),('en','with'),
              ('de','auf'),('de','das'),('de','der'),('de','die'),('de','ein'),
              ('de','für'),('de','ist'),('de','mit'),('de','nicht'),('de','und'),
              ('fr','dans'),('fr','est'),('fr','et'),('fr','la'),('fr','le'),
              ('fr','les'),('fr','pas'),('fr','pour'),('fr','que'),('fr','une'),
              ('es','con'),('es','el'),('es','es'),('es','la'),('es','los'),
              ('es','no'),('es','por'),('es','que'),('es','una'),('es','y')),
            toks AS (
              SELECT DISTINCT b.doc_id, lower(t.tok) AS tok
              FROM documents b,
                   unnest(string_split(b.text, ' ')) AS t(tok)
              WHERE t.tok <> ''),
            score AS (
              SELECT p.lg, t.doc_id, count(*) AS c
              FROM toks t JOIN prof p ON p.w = t.tok
              GROUP BY p.lg, t.doc_id),
            best AS (
              SELECT doc_id, lg, c,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY c DESC, lg DESC) AS rn
              FROM score),
            pred AS (
              SELECT d.doc_id, d.lang,
                     CASE WHEN regexp_matches(d.text,
                              '[\u3400-\u4DBF\u4E00-\u9FFF\uF900-\uFAFF]')
                          THEN 'zh'
                          ELSE coalesce(b.lg, 'und') END AS predicted_lang
              FROM documents d
              LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1)
            SELECT doc_id, lang, predicted_lang FROM pred ORDER BY doc_id
        """,
        "nb_classifier": """
            WITH base AS (
              SELECT doc_id, lang, string_split(text, ' ') AS toks
              FROM documents),
            tok AS (
              SELECT b.doc_id, b.toks[i.i] AS t
              FROM base b,
                   unnest(generate_series(1, len(b.toks))) AS i(i)
              WHERE b.toks[i.i] <> ''),
            h AS (
              SELECT doc_id,
                     list_reduce(
                       list_transform(generate_series(1, length(t)),
                                      j -> unicode(substr(t, j, 1))),
                       (a, x) -> (a * 31 + x) % 1000003) % 2048 AS bk
              FROM tok),
            cls AS (SELECT lang AS c, count(*) AS ndocs
                    FROM documents GROUP BY lang),
            tot AS (SELECT count(*) AS n FROM documents),
            cc AS (SELECT b.lang AS c, h.bk, count(*) AS cnt
                   FROM h JOIN base b USING (doc_id) GROUP BY 1, 2),
            ctot AS (SELECT c, sum(cnt) AS t FROM cc GROUP BY c),
            docsc AS (
              SELECT d.doc_id, cls.c,
                     ln(cls.ndocs * 1.0 / tot.n)
                     + coalesce(sum(
                         CASE WHEN h.bk IS NULL THEN NULL
                              ELSE ln((coalesce(cc.cnt, 0) + 1.0)
                                      / (coalesce(ctot.t, 0) + 2048.0))
                         END), 0) AS score
              FROM documents d CROSS JOIN cls CROSS JOIN tot
              LEFT JOIN h ON h.doc_id = d.doc_id
              LEFT JOIN ctot ON ctot.c = cls.c
              LEFT JOIN cc ON cc.c = cls.c AND cc.bk = h.bk
              GROUP BY d.doc_id, cls.c, cls.ndocs, tot.n, ctot.t),
            pred AS (
              SELECT doc_id, c, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, c ASC) AS rn
              FROM docsc)
            SELECT p.doc_id, p.c AS nb_pred,
                   printf('%.4f', e.score) AS nb_score
            FROM pred p JOIN docsc e
              ON e.doc_id = p.doc_id AND e.c = 'en'
            WHERE p.rn = 1 ORDER BY p.doc_id
        """,
        "dedup_remove_spans": """
            WITH tok AS (
              SELECT t.doc_id, i.i - 1 AS pos, t.toks[i.i] AS tok
              FROM (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents) t,
                   unnest(generate_series(1, len(t.toks))) AS i(i)),
            win AS (
              SELECT doc_id, pos,
                     tok || ' ' || lead(tok, 1) OVER w
                         || ' ' || lead(tok, 2) OVER w AS wtext,
                     lead(tok, 2) OVER w IS NOT NULL AS full_w
              FROM tok
              WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            wins AS (SELECT doc_id, pos, wtext FROM win WHERE full_w),
            dup AS (SELECT wtext FROM wins
                    GROUP BY wtext HAVING count(DISTINCT doc_id) >= 2),
            rem AS (
              SELECT doc_id, pos FROM wins
              WHERE wtext IN (SELECT wtext FROM dup)
              QUALIFY row_number() OVER (PARTITION BY wtext
                                         ORDER BY doc_id, pos) > 1),
            covered AS (
              SELECT DISTINCT t.doc_id, t.pos
              FROM rem r JOIN tok t ON t.doc_id = r.doc_id
               AND t.pos BETWEEN r.pos AND r.pos + 2),
            kept AS (
              SELECT t.doc_id, t.pos, t.tok
              FROM tok t LEFT JOIN covered c
                ON c.doc_id = t.doc_id AND c.pos = t.pos
              WHERE c.pos IS NULL),
            cov_n AS (SELECT doc_id, count(*) AS n FROM covered
                      GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce((SELECT string_agg(k.tok, ' ' ORDER BY k.pos)
                             FROM kept k WHERE k.doc_id = d.doc_id), '')
                     AS text,
                   CAST(coalesce(cn.n, 0) AS BIGINT) AS removed_tokens
            FROM documents d LEFT JOIN cov_n cn ON cn.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "fuzzy_transpositions": f"""
            SELECT DISTINCT doc_id FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE damerau_levenshtein(t.tok, 'ahsh') <= 1
              AND t.tok NOT IN {STOP} AND t.tok <> ''
        """,
        "term_query": """
            SELECT DISTINCT doc_id FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok = 'window'
        """,
        "term_case_insensitive": """
            SELECT DISTINCT doc_id FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE lower(d.lang) = lower('EN')
              AND lower(t.tok) = lower('WINDOW')
            ORDER BY doc_id
        """,
        "function_score_random": _bm25_sql("""
            , win AS (
              SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC, doc_id) AS r
              FROM scored QUALIFY r <= 100),
            fs AS (
              SELECT doc_id,
                     score * (CAST(((CAST(doc_id AS UBIGINT) + 42)
                                    * 2654435761) % 4294967296 AS DOUBLE)
                              / 4294967296.0) AS fscore
              FROM win)
            SELECT doc_id, printf('%.5f', fs.fscore) AS score,
                   CAST(row_number() OVER (ORDER BY fs.fscore DESC, doc_id)
                        AS BIGINT) AS rank
            FROM fs ORDER BY fs.fscore DESC, doc_id LIMIT 10"""),
        "neural_sparse": """
            WITH scored AS (
              SELECT event_id,
                     0.5 * value + 2.0 * (user_id % 7) AS score
              FROM events)
            SELECT event_id, printf('%.4f', scored.score) AS score,
                   CAST(row_number() OVER (ORDER BY scored.score DESC,
                                           event_id) AS BIGINT) AS rank
            FROM scored ORDER BY scored.score DESC, event_id LIMIT 10
        """,
        "bool_query": """
            WITH has AS (
              SELECT doc_id, tok FROM documents d,
                     unnest(string_split(d.text, ' ')) AS t(tok))
            SELECT doc_id FROM documents
            WHERE doc_id IN (SELECT doc_id FROM has WHERE tok = 'hash')
              AND doc_id IN (SELECT doc_id FROM has WHERE tok = 'join')
              AND doc_id NOT IN (SELECT doc_id FROM has WHERE tok = 'merge')
        """,
        "phrase_query": """
            SELECT doc_id FROM documents
            WHERE (' ' || text || ' ') LIKE '% batch batch %'
        """,
        "agg_terms": """
            SELECT l_returnflag, count(*) AS doc_count
            FROM lineitem GROUP BY l_returnflag
            ORDER BY doc_count DESC, l_returnflag LIMIT 10
        """,
        "agg_multi_terms": """
            SELECT l_returnflag, l_linestatus, count(*) AS doc_count
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY doc_count DESC, l_returnflag, l_linestatus LIMIT 10
        """,
        "agg_stats": """
            SELECT count(*) AS count, min(l_quantity) AS min, max(l_quantity) AS max,
                   printf('%.2f', sum(l_quantity)) AS sum,
                   printf('%.6f', avg(l_quantity)) AS avg
            FROM lineitem
        """,
        "agg_extended_stats": """
            SELECT count(*) AS count, min(l_discount) AS min, max(l_discount) AS max,
                   printf('%.6f', sum(l_discount)) AS sum,
                   printf('%.6f', avg(l_discount)) AS avg,
                   printf('%.6f', var_pop(l_discount)) AS variance,
                   printf('%.6f', stddev_pop(l_discount)) AS std_deviation,
                   printf('%.6f', sum(l_discount * l_discount)) AS sum_of_squares
            FROM lineitem
        """,
        "agg_value_count": "SELECT count(o_custkey) AS value_count FROM orders",
        "agg_weighted_avg": """
            SELECT printf('%.4f', sum(l_extendedprice * l_quantity) / sum(l_quantity))
                   AS weighted_avg
            FROM lineitem
        """,
        "agg_cardinality": "SELECT count(DISTINCT l_partkey) AS cardinality FROM lineitem",
        "agg_date_histogram": """
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   count(*) AS doc_count,
                   printf('%.2f', sum(o_totalprice)) AS total_price
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "agg_histogram": """
            SELECT floor(value / 50.0) * 50.0 AS key, count(*) AS doc_count
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "agg_range": """
            SELECT key, count(*) AS doc_count FROM (
              SELECT CASE WHEN l_quantity < 10.0 THEN '*-10.0'
                          WHEN l_quantity < 25.0 THEN '10.0-25.0'
                          ELSE '25.0-*' END AS key
              FROM lineitem) GROUP BY key
        """,
        "agg_composite": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS doc_count
            FROM orders GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100
        """,
        "agg_top_hits": """
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
              FROM lineitem) WHERE rn = 1 ORDER BY l_returnflag
        """,
        "scripted_metric": """
            SELECT CAST(count(value) AS BIGINT) AS n,
                   printf('%.2f', sum(value)) AS sum_value,
                   printf('%.2f', sum(value * value)) AS sum_sq
            FROM events WHERE value IS NOT NULL
        """,
        "agg_matrix_stats": """
            SELECT printf('%.4f', covar_pop(l_quantity, l_extendedprice)) AS covariance,
                   printf('%.6f', corr(l_quantity, l_extendedprice)) AS correlation
            FROM lineitem
        """,
        "agg_cumulative_sum": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT month, doc_count,
                   CAST(sum(doc_count) OVER (ORDER BY month) AS BIGINT)
                     AS cum_count
            FROM m ORDER BY month
        """,
        "agg_derivative": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT month, doc_count - lag(doc_count) OVER (ORDER BY month) AS deriv
            FROM m QUALIFY lag(doc_count) OVER (ORDER BY month) IS NOT NULL
            ORDER BY month
        """,
        "sort_page2": """
            SELECT event_id, value FROM events
            ORDER BY ts, event_id LIMIT 20 OFFSET 20
        """,
        "sort_field_missing": """
            WITH hit AS (
              SELECT DISTINCT doc_id FROM documents d,
                     unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok = 'hash'),
            opt AS (
              SELECT doc_id,
                     CASE WHEN n_chars >= 300 THEN source END AS opt_source
              FROM documents)
            SELECT o.doc_id, o.opt_source,
                   CAST(row_number() OVER (
                     ORDER BY o.opt_source ASC NULLS LAST, o.doc_id) AS BIGINT)
                     AS rank
            FROM opt o JOIN hit h USING (doc_id)
            ORDER BY o.opt_source ASC NULLS LAST, o.doc_id LIMIT 15
        """,
        "sort_nested_field": """
            WITH sel AS (
              SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0),
            k AS (
              SELECT s.o_orderkey,
                     min(l.l_quantity) FILTER (WHERE l.l_discount > 0.05)
                       AS kk
              FROM sel s LEFT JOIN lineitem l
                ON l.l_orderkey = s.o_orderkey
              GROUP BY s.o_orderkey)
            SELECT o_orderkey,
                   CASE WHEN kk IS NULL THEN 'missing'
                        ELSE printf('%.2f', kk) END AS sort_key,
                   CAST(row_number() OVER (
                     ORDER BY kk ASC NULLS LAST, o_orderkey) AS BIGINT)
                     AS rank
            FROM k ORDER BY rank
        """,
        "sort_script_page": """
            WITH hit AS (
              SELECT DISTINCT doc_id FROM documents d,
                     unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok = 'join'),
            keyed AS (
              SELECT d.doc_id, d.n_chars % 7 AS mod7 FROM documents d
              JOIN hit h USING (doc_id))
            SELECT doc_id, mod7,
                   CAST(row_number() OVER (ORDER BY mod7, doc_id) - 5 AS BIGINT)
                     AS rank
            FROM keyed ORDER BY mod7, doc_id LIMIT 20 OFFSET 5
        """,
        "sort_geo_distance": """
            WITH pts AS (
              SELECT event_id,
                     (user_id % 180) - 89.5 AS lat,
                     (event_id % 360) - 179.5 AS lon
              FROM events),
            d AS (
              SELECT event_id,
                     2.0 * 6371008.7714 * asin(sqrt(
                       pow(sin(radians(lat) / 2.0), 2)
                       + cos(radians(lat)) * pow(sin(radians(lon) / 2.0), 2)))
                     AS dist
              FROM pts)
            SELECT event_id, printf('%.1f', d.dist) AS dist,
                   CAST(row_number() OVER (ORDER BY d.dist, event_id)
                        AS BIGINT) AS rank
            FROM d ORDER BY d.dist, event_id LIMIT 15
        """,
        "fetch_source_filter": """
            WITH hit AS (
              SELECT DISTINCT doc_id FROM documents d,
                     unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok = 'stream')
            SELECT d.doc_id, d.lang FROM documents d JOIN hit h USING (doc_id)
            ORDER BY d.doc_id
        """,
        "fetch_docvalue_fields": """
            WITH hit AS (
              SELECT DISTINCT doc_id FROM documents d,
                     unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok = 'window')
            SELECT d.doc_id, d.n_chars FROM documents d JOIN hit h USING (doc_id)
            ORDER BY d.doc_id
        """,
        "fetch_script_fields": """
            WITH hit AS (
              SELECT DISTINCT doc_id FROM documents d,
                     unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok = 'merge')
            SELECT d.doc_id, d.n_chars // 100 AS chars_bucket,
                   d.lang || ':' || d.source AS lang_src
            FROM documents d JOIN hit h USING (doc_id)
            ORDER BY d.doc_id
        """,
        "collapse": """
            SELECT user_id, event_id, value FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id) AS rn
              FROM events) WHERE rn = 1 ORDER BY user_id
        """,
        "function_score": """
            SELECT event_id, value,
                   CAST(row_number() OVER (ORDER BY value DESC, event_id) AS BIGINT) AS rank
            FROM events ORDER BY value DESC, event_id LIMIT 10
        """,
        "ingest_pipeline": """
            SELECT event_id, upper(event_type) AS event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                   'demo' AS pipeline
            FROM events
        """,
        "ingest_kv": """
            SELECT event_id, event_id AS evt, event_type AS type, value
            FROM events
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "dedup_cluster_keep_best": f"""
            WITH RECURSIVE tok AS (
              SELECT DISTINCT d.doc_id, t.tok AS token
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}
            ),
            grp AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
            cand AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM tok a JOIN tok b USING (token) JOIN grp USING (token)
              WHERE a.doc_id < b.doc_id AND grp.df BETWEEN 2 AND 100
              GROUP BY 1, 2
            ),
            sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
              SELECT c.u, c.v, count(*) AS i
              FROM cand c
              JOIN tok ta ON ta.doc_id = c.u
              JOIN tok tb ON tb.doc_id = c.v AND tb.token = ta.token
              GROUP BY c.u, c.v
            ),
            edges AS (
              SELECT i.u, i.v
              FROM inter i JOIN sz su ON su.doc_id = i.u
                           JOIN sz sv ON sv.doc_id = i.v
              WHERE CAST(i.i AS DOUBLE) / (su.n + sv.n - i.i) >= 0.5
            ),
            nodes AS (SELECT u AS node FROM edges
                      UNION SELECT v FROM edges),
            reach(node, lab) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT CASE WHEN e.u = r.node THEN e.v ELSE e.u END, r.lab
              FROM reach r JOIN edges e ON e.u = r.node OR e.v = r.node
            ),
            comp AS (SELECT node AS doc_id, min(lab) AS component
                     FROM reach GROUP BY node),
            ranked AS (
              SELECT c.component, c.doc_id,
                     row_number() OVER (PARTITION BY c.component
                                        ORDER BY d.n_chars DESC, c.doc_id)
                       AS rk,
                     count(*) OVER (PARTITION BY c.component) AS n_members
              FROM comp c JOIN documents d USING (doc_id)
            )
            SELECT component, doc_id AS keep_id, n_members
            FROM ranked WHERE rk = 1 ORDER BY component
        """,
        "token_count": """
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS whitespace_tokens
            FROM documents
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                     AS n_tokens,
                   CAST(len(list_filter(string_split(text, ' '),
                                          x -> x IN {STOP})) AS DOUBLE)
                       / len(list_filter(string_split(text, ' '), x -> x <> ''))
                     AS stopword_ratio
            FROM documents
        """,
        "analyze_custom_chain": """
            SELECT doc_id, lower(t.tok) AS token
            FROM documents d,
                 unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE len(t.tok) BETWEEN 3 AND 8
            ORDER BY doc_id, token
        """,
        "lm_quality": """
            WITH tris AS (
              SELECT doc_id, substr(text, i, 3) AS tri,
                     substr(text, i, 2) AS bi
              FROM documents,
                   unnest(generate_series(1, greatest(len(text) - 2, 0)))
                     AS t(i)),
            c3 AS (SELECT tri, count(*) AS c FROM tris GROUP BY tri),
            c2 AS (SELECT bi, count(*) AS c FROM tris GROUP BY bi),
            v AS (SELECT CAST(count(*) AS DOUBLE) AS v3 FROM c3)
            SELECT t.doc_id,
                   printf('%.4f', avg(ln((c3.c + 1.0) / (c2.c + v.v3))))
                     AS lm_score
            FROM tris t JOIN c3 USING (tri) JOIN c2 USING (bi)
            CROSS JOIN v
            GROUP BY t.doc_id ORDER BY t.doc_id
        """,
        "dsir_logweight": """
            WITH base AS (
              SELECT doc_id, lang, string_split(text, ' ') AS toks
              FROM documents),
            tok AS (
              SELECT b.doc_id, b.lang, i.i AS pos, b.toks[i.i] AS t
              FROM base b,
                   unnest(generate_series(1, len(b.toks))) AS i(i)
              WHERE b.toks[i.i] <> ''),
            h AS (
              SELECT doc_id, lang, pos,
                     list_reduce(
                       list_transform(generate_series(1, length(t)),
                                      j -> unicode(substr(t, j, 1))),
                       (a, x) -> (a * 31 + x) % 1000003) AS hv
              FROM tok),
            grams AS (
              SELECT doc_id, lang, hv % 4096 AS bk FROM h
              UNION ALL
              SELECT doc_id, lang,
                     ((hv::BIGINT * 8191
                       + lead(hv) OVER (PARTITION BY doc_id
                                        ORDER BY pos)) % 1000003)
                     % 4096 AS bk
              FROM h
              QUALIFY lead(hv) OVER (PARTITION BY doc_id ORDER BY pos)
                      IS NOT NULL),
            tc AS (SELECT bk, count(*) AS c FROM grams
                   WHERE lang = 'en' GROUP BY bk),
            rc AS (SELECT bk, count(*) AS c FROM grams GROUP BY bk),
            tot AS (SELECT (SELECT sum(c) FROM tc) AS tt,
                           (SELECT sum(c) FROM rc) AS rt),
            llr AS (
              SELECT r.bk,
                     ln((coalesce(t.c, 0) + 1.0) / (tot.tt + 4096.0))
                   - ln((r.c + 1.0) / (tot.rt + 4096.0)) AS v
              FROM rc r LEFT JOIN tc t ON r.bk = t.bk CROSS JOIN tot)
            SELECT g.doc_id, printf('%.4f', sum(l.v)) AS dsir_logw
            FROM grams g JOIN llr l ON g.bk = l.bk
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        "bulk_ndjson_source": """
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000
                        ELSE n_chars END AS n_chars,
                   lang
            FROM documents WHERE doc_id % 11 <> 0 ORDER BY doc_id
        """,
        "c4_quality_signals": """
            WITH lines AS (
              SELECT d.doc_id, trim(l.line) AS line
              FROM documents d,
                   unnest(string_split(d.text, chr(10))) AS l(line)),
            per AS (
              SELECT doc_id,
                     count(*) FILTER (line <> '') AS n_lines,
                     count(*) FILTER (line <> '' AND regexp_matches(
                         line, '[.!?]["”'']?$')) AS n_punct,
                     count(*) FILTER (line <> '' AND regexp_matches(
                         line, '^[-*•]')) AS n_bullet,
                     count(*) FILTER (line <> '' AND regexp_matches(
                         line, '\\.\\.\\.$')) AS n_ellip
              FROM lines GROUP BY doc_id)
            SELECT d.doc_id,
                   p.n_lines,
                   CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT)
                     AS n_words,
                   printf('%.4f', CAST(p.n_punct AS DOUBLE)
                          / greatest(p.n_lines, 1)) AS punct_line_ratio,
                   printf('%.4f', CAST(p.n_bullet AS DOUBLE)
                          / greatest(p.n_lines, 1)) AS bullet_line_ratio,
                   printf('%.4f', CAST(p.n_ellip AS DOUBLE)
                          / greatest(p.n_lines, 1)) AS ellipsis_line_ratio,
                   (d.text LIKE '%{%') AS has_curly,
                   (lower(d.text) LIKE '%lorem ipsum%') AS has_lorem
            FROM documents d JOIN per p USING (doc_id)
            ORDER BY d.doc_id
        """,
        "fingerprint": """
            SELECT doc_id,
                   array_to_string(list_sort(list_distinct(
                     list_filter(string_split(text, ' '), x -> x <> ''))), ' ')
                   AS fingerprint
            FROM documents
        """,

        "asof_join": """
            WITH l AS (SELECT user_id, ts, event_id FROM events
                       WHERE event_type = 'purchase'),
                 r AS (SELECT user_id, ts, value FROM events
                       WHERE event_type = 'signup')
            SELECT l.event_id, r.value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.event_id
        """,
        "hash_join": """
            SELECT c.c_mktsegment, count(*) AS order_count,
                   printf('%.2f', sum(o.o_totalprice)) AS total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
        "window_tumbling": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS window_start,
                   count(*) AS doc_count,
                   printf('%.2f', sum(value)) AS value_sum
            FROM events GROUP BY 1, date_trunc('hour', ts) ORDER BY 1, 2
        """,
        "window_sliding": """
            WITH covered AS (
              SELECT event_type, value,
                     date_trunc('hour', ts) AS window_start FROM events
              UNION ALL
              SELECT event_type, value,
                     date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events)
            SELECT event_type,
                   strftime(window_start, '%Y-%m-%d %H') AS window_start,
                   count(*) AS doc_count,
                   printf('%.2f', sum(value)) AS value_sum
            FROM covered GROUP BY event_type, covered.window_start
            ORDER BY 1, 2
        """,
        "window_session": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o)
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS doc_count
            FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
        """,
        "alias_filtered_search": _bm25_sql("""
            SELECT doc_id, rank, score FROM (
              SELECT sc.doc_id,
                     CAST(row_number() OVER (
                       ORDER BY sc.score DESC, sc.doc_id) AS BIGINT)
                       AS rank,
                     printf('%.4f', sc.score) AS score
              FROM scored sc JOIN documents d USING (doc_id)
              WHERE d.lang = 'en') ORDER BY rank LIMIT 10"""),
        "bm25_filtered": _bm25_sql("""
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score
            FROM scored sc JOIN documents d USING (doc_id)
            WHERE d.lang = 'en'"""),
        "collapse_bm25_by_lang": _bm25_sql("""
            SELECT lang, doc_id, score FROM (
              SELECT d.lang, sc.doc_id, printf('%.4f', sc.score) AS score,
                     row_number() OVER (PARTITION BY d.lang
                       ORDER BY sc.score DESC, sc.doc_id) AS rn
              FROM scored sc JOIN documents d USING (doc_id)
            ) WHERE rn = 1 ORDER BY lang LIMIT 10"""),
        "term_suggester": f"""
            WITH vocab AS (
              SELECT t.tok AS token, count(DISTINCT d.doc_id) AS df
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}
              GROUP BY t.tok)
            SELECT token AS suggestion,
                   CAST(levenshtein(token, 'hsah') AS BIGINT) AS distance, df,
                   CAST(row_number() OVER (
                     ORDER BY levenshtein(token, 'hsah'), df DESC, token)
                     AS BIGINT) AS rank
            FROM vocab
            WHERE token <> 'hsah' AND levenshtein(token, 'hsah') <= 2
            ORDER BY distance, df DESC, suggestion LIMIT 5
        """,
        "function_score_decay": """
            WITH sc AS (
              SELECT event_id,
                     exp(-(pow(greatest(0.0, abs(value - 100.0)), 2))
                         / (2.0 * (-(50.0*50.0) / (2.0 * ln(0.5))))) AS score
              FROM events)
            SELECT event_id, printf('%.6f', score) AS score,
                   CAST(row_number() OVER (ORDER BY score DESC, event_id)
                        AS BIGINT) AS rank
            FROM sc ORDER BY sc.score DESC, event_id LIMIT 10
        """,
        "terms_lookup": """
            SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
            ORDER BY l_orderkey, l_linenumber
        """,
        "search_after": _bm25_sql("""
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id) + 10
                        AS BIGINT) AS rank,
                   printf('%.4f', score) AS score
            FROM (SELECT * FROM scored ORDER BY score DESC, doc_id
                  LIMIT 10 OFFSET 10)"""),
        "agg_moving_avg": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT month, doc_count,
                   printf('%.4f', avg(doc_count) OVER (ORDER BY month
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS mov_avg
            FROM m ORDER BY month
        """,
        "geo_shape_docs": """
            WITH g AS (SELECT event_id,
                         CAST(user_id % 180 AS DOUBLE) - 89.5 AS lat,
                         CAST(event_id % 360 AS DOUBLE) - 179.5 AS lon
                       FROM events)
            SELECT * FROM (
              SELECT 'intersects' AS relation, event_id FROM g
              WHERE lon - 3 <= 20 AND lon + 3 >= -20
                AND lat - 3 <= 20 AND lat + 3 >= -20
              UNION ALL
              SELECT 'within', event_id FROM g
              WHERE lon - 3 >= -20 AND lon + 3 <= 20
                AND lat - 3 >= -20 AND lat + 3 <= 20
              UNION ALL
              SELECT 'contains', event_id FROM g
              WHERE lon - 3 <= -1 AND lon + 3 >= 1
                AND lat - 3 <= -1 AND lat + 3 >= 1
            ) ORDER BY relation, event_id
        """,
        "agg_moving_avg_ewma": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                       AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1),
            w AS (SELECT month, doc_count,
                         array_agg(CAST(doc_count AS DOUBLE)) OVER (
                           ORDER BY month
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS l
                  FROM m)
            SELECT month, doc_count,
                   printf('%.4f', list_reduce(l, (a, x) -> x*0.5 + a*0.5))
                     AS mov_ewma
            FROM w ORDER BY month
        """,
        "agg_moving_percentiles": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                       AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT month, doc_count,
                   printf('%.4f', quantile_cont(CAST(doc_count AS DOUBLE),
                     0.5) OVER (ORDER BY month
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS p50,
                   printf('%.4f', quantile_cont(CAST(doc_count AS DOUBLE),
                     0.9) OVER (ORDER BY month
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS p90
            FROM m ORDER BY month
        """,
        "agg_moving_avg_linear": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                       AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1),
            w AS (SELECT month, doc_count,
                         array_agg(CAST(doc_count AS DOUBLE)) OVER (
                           ORDER BY month
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS l
                  FROM m)
            SELECT month, doc_count,
                   printf('%.4f',
                          list_sum(list_transform(l, (x, i) -> x*i))
                          / list_sum(list_transform(
                                l, (x, i) -> CAST(i AS DOUBLE))))
                     AS mov_linear
            FROM w ORDER BY month
        """,
        "agg_serial_diff": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT month, doc_count - lag(doc_count, 2) OVER (ORDER BY month)
                   AS sdiff
            FROM m QUALIFY lag(doc_count, 2) OVER (ORDER BY month) IS NOT NULL
            ORDER BY month
        """,
        "agg_rare_terms": f"""
            SELECT t.tok AS token, count(DISTINCT d.doc_id) AS df
            FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok <> '' AND t.tok NOT IN {STOP}
            GROUP BY t.tok HAVING count(DISTINCT d.doc_id) <= 2
            ORDER BY token
        """,
        "agg_filters": """
            SELECT 'errors' AS name, count(*) AS doc_count FROM events
            WHERE event_type = 'error'
            UNION ALL
            SELECT 'big' AS name, count(*) AS doc_count FROM events
            WHERE value > 150.0
        """,
        "agg_bucket_selector": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT month, doc_count FROM m
            WHERE doc_count > (SELECT avg(doc_count) FROM m)
            ORDER BY month
        """,
        "search_as_you_type": _sayt_sql(),
        "agg_percentiles_bucket": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1),
            arr AS (SELECT list(doc_count ORDER BY doc_count) AS a,
                           count(*) AS n FROM m),
            p AS (SELECT unnest([1.0, 25.0, 50.0, 75.0, 99.0]) AS percent)
            SELECT printf('%.1f', percent) AS percent,
                   printf('%.4f', CAST(a[CAST(floor(percent/100.0*(n-1)+0.5)
                                              AS BIGINT) + 1] AS DOUBLE)) AS value
            FROM p, arr ORDER BY CAST(percent AS DOUBLE)
        """,
        "agg_extended_stats_bucket": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS count,
                   printf('%.1f', CAST(min(doc_count) AS DOUBLE)) AS min,
                   printf('%.1f', CAST(max(doc_count) AS DOUBLE)) AS max,
                   printf('%.1f', CAST(sum(doc_count) AS DOUBLE)) AS sum,
                   printf('%.4f', avg(CAST(doc_count AS DOUBLE))) AS avg,
                   printf('%.1f', sum(CAST(doc_count AS DOUBLE) * doc_count))
                     AS sum_of_squares,
                   printf('%.4f', sum(CAST(doc_count AS DOUBLE) * doc_count)
                          / count(*) - avg(CAST(doc_count AS DOUBLE))
                          * avg(CAST(doc_count AS DOUBLE))) AS variance,
                   printf('%.4f', sqrt(sum(CAST(doc_count AS DOUBLE) * doc_count)
                          / count(*) - avg(CAST(doc_count AS DOUBLE))
                          * avg(CAST(doc_count AS DOUBLE)))) AS std_deviation
            FROM m
        """,
        "agg_max_bucket": """
            WITH m AS (
              SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                     count(*) AS doc_count
              FROM orders GROUP BY 1)
            SELECT string_agg(month, ',' ORDER BY month) AS keys,
                   printf('%.1f', CAST(max(doc_count) AS DOUBLE)) AS value
            FROM m WHERE doc_count = (SELECT max(doc_count) FROM m)
        """,
        "multi_match": _multi_match_sql(),
        "multi_match_cross_fields": _multi_match_cross_sql(),
        "multi_match_phrase": """
            WITH base AS (
              SELECT doc_id, text AS body,
                     array_to_string(
                       list_slice(string_split(text, ' '), 1, 4), ' ')
                       AS title
              FROM documents)
            SELECT doc_id FROM base
            WHERE (' ' || title || ' ') LIKE '% hash join %'
               OR (' ' || body  || ' ') LIKE '% hash join %'
            ORDER BY doc_id
        """,
        "multi_index_union": _multi_index_sql(),
        "indices_boost": _multi_index_sql(2.0, 0.5),
        "post_filter": _bm25_sql("""
            SELECT d.source AS key,
                   count(DISTINCT d.doc_id) AS doc_count,
                   (SELECT count(DISTINCT t2.doc_id) FROM tf t2
                    JOIN documents d2 ON d2.doc_id = t2.doc_id
                    WHERE d2.lang = 'en'
                      AND t2.token IN ('hash', 'join', 'stream'))
                     AS filtered_hits
            FROM (SELECT DISTINCT doc_id FROM tf
                  WHERE token IN ('hash', 'join', 'stream')) m
            JOIN documents d ON d.doc_id = m.doc_id
            GROUP BY d.source ORDER BY key"""),
        "min_score": _bm25_sql("""
            SELECT doc_id, printf('%.4f', score) AS score FROM scored
            WHERE score >= 4.0"""),
        "matched_queries": _bm25_sql("""
            SELECT doc_id,
                   concat_ws(',',
                     CASE WHEN bool_or(token IN ('hash', 'join'))
                          THEN 'clause_hj' END,
                     CASE WHEN bool_or(token = 'stream')
                          THEN 'clause_st' END) AS matched
            FROM tf WHERE token IN ('hash', 'join', 'stream')
            GROUP BY doc_id ORDER BY doc_id"""),
        "agg_geo_bounds": """
            SELECT printf('%.1f', max((user_id % 180) - 89.5)) AS top,
                   printf('%.1f', min((user_id % 180) - 89.5)) AS bottom,
                   printf('%.1f', min((event_id % 360) - 179.5)) AS "left",
                   printf('%.1f', max((event_id % 360) - 179.5)) AS "right"
            FROM events
        """,
        "nested_query": """
            SELECT DISTINCT o_orderkey FROM orders
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_quantity > 45.0 AND l_discount > 0.05
            ORDER BY o_orderkey
        """,
        "agg_children": """
            SELECT o_orderstatus, count(*) AS doc_count,
                   printf('%.2f', sum(l_quantity)) AS sum
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "agg_parent": """
            SELECT o_orderstatus, count(DISTINCT o_orderkey) AS doc_count
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_quantity >= 45.0
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "has_child_query": """
            SELECT o_orderkey FROM orders
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_quantity >= 45.0
            GROUP BY o_orderkey HAVING count(*) >= 2
            ORDER BY o_orderkey
        """,
        "has_child_score": """
            SELECT o_orderkey, printf('%.2f', sum(l_quantity)) AS score
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_quantity >= 45.0
            GROUP BY o_orderkey ORDER BY o_orderkey
        """,
        "has_parent_query": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
            ORDER BY l_orderkey, l_linenumber
        """,
        "parent_id_query": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   printf('%.1f', l_quantity) AS l_quantity
            FROM lineitem
            WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
            ORDER BY l_linenumber, l_quantity
        """,
        "has_child_inner_hits": """
            WITH m AS (
              SELECT l_orderkey, l_linenumber,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber) AS rnk,
                     count(*) OVER (PARTITION BY l_orderkey) AS cnt
              FROM lineitem JOIN orders ON o_orderkey = l_orderkey
              WHERE l_quantity >= 45.0)
            SELECT l_orderkey AS o_orderkey,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   CAST(rnk AS BIGINT) AS inner_rank
            FROM m WHERE cnt >= 2 AND rnk <= 3
            ORDER BY o_orderkey, inner_rank, l_linenumber
        """,
        "nested_inner_hits": """
            WITH m AS (
              SELECT o_orderkey, l_linenumber,
                     row_number() OVER (PARTITION BY o_orderkey
                                        ORDER BY l_linenumber) AS rnk
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              WHERE l_quantity > 45.0 AND l_discount > 0.05)
            SELECT o_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   CAST(rnk AS BIGINT) AS inner_rank
            FROM m WHERE rnk <= 2
            ORDER BY o_orderkey, inner_rank, l_linenumber
        """,
        "collapse_inner_hits": _bm25_sql("""
            , keyed AS (
              SELECT sc.doc_id, sc.score, d.lang,
                     row_number() OVER (PARTITION BY d.lang
                                        ORDER BY sc.score DESC, sc.doc_id)
                       AS inner_rank
              FROM scored sc JOIN documents d USING (doc_id)),
            topg AS (
              SELECT lang FROM keyed WHERE inner_rank = 1
              ORDER BY score DESC, doc_id LIMIT 5)
            SELECT k.lang, k.doc_id, printf('%.4f', k.score) AS score,
                   CAST(k.inner_rank AS BIGINT) AS inner_rank
            FROM keyed k JOIN topg USING (lang)
            WHERE k.inner_rank <= 3
            ORDER BY k.lang, k.inner_rank
        """),
        "nested_agg": """
            SELECT o_orderstatus, count(*) AS item_count,
                   printf('%.2f', sum(l_quantity)) AS qty_sum
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "percolate": f"""
            WITH has AS (
              SELECT DISTINCT doc_id, t.tok AS token
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {_stop_sql()})
            SELECT doc_id, query_id FROM (
              SELECT doc_id, 'q_hash_join' AS query_id FROM documents
              WHERE doc_id IN (SELECT doc_id FROM has WHERE token = 'hash')
                AND doc_id IN (SELECT doc_id FROM has WHERE token = 'join')
              UNION ALL
              SELECT doc_id, 'q_streamish' FROM documents
              WHERE doc_id IN (SELECT doc_id FROM has
                               WHERE token IN ('stream', 'window'))
              UNION ALL
              SELECT doc_id, 'q_merge_only' FROM documents
              WHERE doc_id IN (SELECT doc_id FROM has WHERE token = 'merge')
                AND doc_id NOT IN (SELECT doc_id FROM has WHERE token = 'hash')
            ) ORDER BY doc_id, query_id
        """,
        "dis_max_query": _bm25_sql("""
            , persub AS (
              SELECT tf.doc_id, tf.token,
                     ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
                     * (1.2 + 1.0) * tf.tf
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlq.dl_q / c.avgdl))
                       AS sc
              FROM tf JOIN df USING (token)
              JOIN dlq ON dlq.doc_id = tf.doc_id CROSS JOIN consts c
              WHERE tf.token IN ('hash', 'join', 'stream')),
            s1 AS (SELECT doc_id, sum(sc) AS sc FROM persub
                   WHERE token IN ('hash', 'join') GROUP BY doc_id),
            s2 AS (SELECT doc_id, sum(sc) AS sc FROM persub
                   WHERE token = 'stream' GROUP BY doc_id),
            comb AS (
              SELECT doc_id,
                     greatest(coalesce(s1.sc, 0), coalesce(s2.sc, 0))
                     + 0.3 * (coalesce(s1.sc, 0) + coalesce(s2.sc, 0)
                              - greatest(coalesce(s1.sc, 0), coalesce(s2.sc, 0)))
                       AS score
              FROM s1 FULL OUTER JOIN s2 USING (doc_id))
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank,
                   printf('%.4f', score) AS score
            FROM comb ORDER BY comb.score DESC, doc_id LIMIT 10""",
            query_terms=["hash", "join", "stream"]),
        "boosting_query": _bm25_sql("""
            SELECT sc.doc_id,
                   printf('%.4f', sc.score * CASE WHEN sc.doc_id IN (
                     SELECT doc_id FROM tok WHERE token = 'merge')
                     THEN 0.5 ELSE 1.0 END) AS score
            FROM scored sc""", query_terms=["hash", "join"]),
        "query_string": _bm25_sql("""
            , hasd AS (SELECT DISTINCT doc_id, token FROM tok)
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score
            FROM scored sc
            WHERE (sc.doc_id IN (SELECT doc_id FROM hasd WHERE token = 'hash')
                   AND sc.doc_id IN (SELECT doc_id FROM hasd WHERE token = 'join')
                   OR sc.doc_id IN (SELECT doc_id FROM hasd WHERE token = 'stream'))
              AND sc.doc_id NOT IN (SELECT doc_id FROM hasd WHERE token = 'merge')""",
            query_terms=["hash", "join", "stream"]),
        "phrase_suggest": f"""
            WITH tok AS (
              SELECT d.doc_id, t.tok AS token
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}),
            stats AS (SELECT token, count(DISTINCT doc_id) AS df,
                             count(*) AS ttf
                      FROM tok GROUP BY token),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM tok),
            c1 AS (SELECT token, ttf FROM (
                     SELECT s.token, s.ttf, row_number() OVER (
                       ORDER BY levenshtein(s.token, 'hash'), s.df DESC,
                                s.token) AS rn
                     FROM stats s WHERE levenshtein(s.token, 'hash') <= 1)
                   WHERE rn <= 5),
            c2 AS (SELECT token, ttf FROM (
                     SELECT s.token, s.ttf, row_number() OVER (
                       ORDER BY levenshtein(s.token, 'joim'), s.df DESC,
                                s.token) AS rn
                     FROM stats s WHERE levenshtein(s.token, 'joim') <= 1)
                   WHERE rn <= 5),
            toklist AS (
              SELECT doc_id, list_filter(string_split(text, ' '),
                       x -> x <> '' AND x NOT IN {STOP}) AS l
              FROM documents),
            big AS (
              SELECT l[i] AS w1, l[i+1] AS w2, count(*) AS n
              FROM toklist, unnest(generate_series(1, len(l) - 1)) AS g(i)
              GROUP BY 1, 2),
            scored AS (
              SELECT c1.token || ' ' || c2.token AS phrase,
                     ln((CAST(c1.ttf AS DOUBLE) / t.T) *
                        CASE WHEN b.n IS NOT NULL
                             THEN CAST(b.n AS DOUBLE) / c1.ttf
                             ELSE 0.4 * c2.ttf / t.T END) AS score
              FROM c1 CROSS JOIN c2 CROSS JOIN tot t
              LEFT JOIN big b ON b.w1 = c1.token AND b.w2 = c2.token)
            SELECT phrase, printf('%.6f', score) AS score,
                   CAST(row_number() OVER (ORDER BY score DESC, phrase)
                        AS BIGINT) AS rank
            FROM scored ORDER BY scored.score DESC, phrase LIMIT 5
        """,
        "agg_date_range": """
            SELECT key, count(*) AS doc_count FROM (
              SELECT CASE WHEN ts < TIMESTAMP '2024-01-10' THEN '*-2024-01-10'
                          WHEN ts < TIMESTAMP '2024-01-20'
                            THEN '2024-01-10-2024-01-20'
                          ELSE '2024-01-20-*' END AS key
              FROM events) GROUP BY key
        """,
        "agg_sampler": """
            WITH sample AS (
              SELECT event_type FROM events
              ORDER BY value DESC, event_id LIMIT 1000)
            SELECT event_type, count(*) AS doc_count
            FROM sample GROUP BY event_type
            ORDER BY doc_count DESC, event_type LIMIT 10
        """,
        "agg_diversified_sampler": """
            WITH diverse AS (
              SELECT event_type, value, event_id FROM (
                SELECT event_type, value, event_id,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY value DESC, event_id) AS rn
                FROM events) WHERE rn <= 1),
            sample AS (
              SELECT event_type FROM diverse
              ORDER BY value DESC, event_id LIMIT 200)
            SELECT event_type, count(*) AS doc_count
            FROM sample GROUP BY event_type
            ORDER BY doc_count DESC, event_type LIMIT 10
        """,
        "agg_significant_text": f"""
            WITH doc_tok AS (
              SELECT DISTINCT d.doc_id, d.lang, t.tok AS term
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {_stop_sql()}),
            per_term AS (
              SELECT term,
                     CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
                          AS BIGINT) AS fg,
                     count(*) AS bg
              FROM doc_tok GROUP BY term),
            tot AS (SELECT CAST(sum(fg) AS DOUBLE) AS n_fg,
                           CAST(sum(bg) AS DOUBLE) AS n_bg FROM per_term),
            scored AS (
              SELECT p.term, p.fg, p.bg,
                     CASE WHEN p.fg / t.n_fg > p.bg / t.n_bg
                          THEN (p.fg / t.n_fg - p.bg / t.n_bg)
                               * ((p.fg / t.n_fg)
                                  / greatest(p.bg / t.n_bg, 1e-9))
                          ELSE 0.0 END AS score
              FROM per_term p CROSS JOIN tot t)
            SELECT term, fg, bg, printf('%.6f', score) AS score
            FROM scored WHERE score > 0
            ORDER BY scored.score DESC, term LIMIT 10
        """,
        "agg_geo_distance": """
            WITH pts AS (
              SELECT (user_id % 180) - 89.5 AS lat,
                     (event_id % 360) - 179.5 AS lon
              FROM events),
            d AS (
              SELECT 2.0 * 6371008.7714 * asin(sqrt(
                       pow(sin(radians(lat) / 2.0), 2)
                       + cos(radians(lat)) * pow(sin(radians(lon) / 2.0), 2)))
                     AS dist
              FROM pts),
            keys(key, lo, hi) AS (VALUES
              ('*-5000000.0', 0.0, 5000000.0),
              ('5000000.0-10000000.0', 5000000.0, 10000000.0),
              ('10000000.0-*', 10000000.0, 1e18))
            SELECT k.key,
                   (SELECT count(*) FROM d WHERE dist >= k.lo AND dist < k.hi)
                     AS doc_count
            FROM keys k
        """,
        "agg_geo_centroid": """
            SELECT printf('%.6f', sum((user_id % 180) - 89.5) / count(*))
                     AS lat,
                   printf('%.6f', sum((event_id % 360) - 179.5) / count(*))
                     AS lon,
                   count(*) AS count
            FROM events
        """,
        "agg_geotile_grid": """
            WITH pts AS (
              SELECT (user_id % 180) - 89.5 AS lat,
                     (event_id % 360) - 179.5 AS lon
              FROM events),
            xy AS (
              SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * 16)
                                         AS BIGINT), 0), 15) AS x,
                     least(greatest(CAST(floor(
                       (0.5 - ln((1.0 + sin(radians(lat)))
                                 / (1.0 - sin(radians(lat)))) / (4.0 * pi()))
                       * 16) AS BIGINT), 0), 15) AS y
              FROM pts)
            SELECT '4/' || x || '/' || y AS key, count(*) AS doc_count
            FROM xy GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 20
        """,
        "agg_composite_geotile": """
            WITH pts AS (
              SELECT (user_id % 180) - 89.5 AS lat,
                     (event_id % 360) - 179.5 AS lon,
                     event_type, value
              FROM events),
            xy AS (
              SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * 16)
                                         AS BIGINT), 0), 15) AS x,
                     least(greatest(CAST(floor(
                       (0.5 - ln((1.0 + sin(radians(lat)))
                                 / (1.0 - sin(radians(lat)))) / (4.0 * pi()))
                       * 16) AS BIGINT), 0), 15) AS y,
                     event_type, value
              FROM pts)
            SELECT '4/' || x || '/' || y AS tile, event_type,
                   count(*) AS doc_count,
                   printf('%.4f', avg(value)) AS avg_value
            FROM xy GROUP BY 1, 2 ORDER BY tile, event_type LIMIT 12
        """,
        "agg_geohash_grid": """
            WITH pts AS (
              SELECT (user_id % 180) - 89.5 AS lat,
                     (event_id % 360) - 179.5 AS lon
              FROM events),
            xy AS (
              SELECT CAST(floor((lon + 180.0) / 360.0 * 32) AS BIGINT) AS x,
                     CAST(floor((lat + 90.0) / 180.0 * 32) AS BIGINT) AS y
              FROM pts),
            h AS (
              -- precision 2 = 10 bits, even count: lon bits at odd positions
              SELECT ((x & 1) << 1) | (((x >> 1) & 1) << 3)
                   | (((x >> 2) & 1) << 5) | (((x >> 3) & 1) << 7)
                   | (((x >> 4) & 1) << 9)
                   | (y & 1) | (((y >> 1) & 1) << 2) | (((y >> 2) & 1) << 4)
                   | (((y >> 3) & 1) << 6) | (((y >> 4) & 1) << 8) AS v
              FROM xy)
            SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz',
                          CAST((v >> 5) AS INT) + 1, 1)
                || substr('0123456789bcdefghjkmnpqrstuvwxyz',
                          CAST((v & 31) AS INT) + 1, 1) AS key,
              count(*) AS doc_count
            FROM h GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 15
        """,
        "range_query": """
            SELECT doc_id FROM documents
            WHERE n_chars >= 200 AND n_chars < 400
        """,
        "geo_distance_query": """
            SELECT event_id FROM (
              SELECT event_id,
                     2.0 * 6371008.7714 * asin(sqrt(
                       pow(sin(radians((user_id % 180) - 89.5) / 2.0), 2)
                       + cos(radians((user_id % 180) - 89.5))
                         * pow(sin(radians((event_id % 360) - 179.5) / 2.0), 2)))
                       AS dist
              FROM events)
            WHERE dist <= 7000000.0 ORDER BY event_id
        """,
        "geo_bounding_box": """
            SELECT event_id FROM events
            WHERE ((user_id % 180) - 89.5) BETWEEN -40.0 AND 40.0
              AND ((event_id % 360) - 179.5) BETWEEN -50.0 AND 50.0
            ORDER BY event_id
        """,
        "rank_feature": """
            SELECT event_id, printf('%.6f', value / (value + 100.0)) AS score,
                   CAST(row_number() OVER (
                     ORDER BY value / (value + 100.0) DESC, event_id)
                     AS BIGINT) AS rank
            FROM events
            ORDER BY value / (value + 100.0) DESC, event_id LIMIT 10
        """,
        "agg_ip_range": """
            WITH keys(key, lo, hi) AS (VALUES
              ('*-10.100.0.0', 0, 100),
              ('10.100.0.0-10.200.0.0', 100, 200),
              ('10.200.0.0-*', 200, 256)),
            b AS (SELECT (user_id % 256) AS v FROM events)
            SELECT k.key,
                   (SELECT count(*) FROM b WHERE v >= k.lo AND v < k.hi)
                     AS doc_count
            FROM keys k
        """,
        "span_near_query": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok = 'stream'
              AND (b.p - a.p) BETWEEN 1 AND 4
        """,
        "span_near_unordered": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok = 'stream'
              AND abs(b.p - a.p) BETWEEN 1 AND 3
        """,
        "exists_query": """
            SELECT doc_id FROM documents WHERE n_chars >= 300
            ORDER BY doc_id
        """,
        "terms_set_query": """
            WITH hit AS (
              SELECT DISTINCT d.doc_id, t.tok FROM documents d,
                unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok IN ('hash', 'join', 'stream'))
            SELECT doc_id FROM hit GROUP BY doc_id
            HAVING count(*) >= (doc_id % 3) + 1
            ORDER BY doc_id
        """,
        "regexp_query": """
            SELECT DISTINCT doc_id FROM documents d,
              unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE regexp_full_match(t.tok, 'st.*m')
            ORDER BY doc_id
        """,
        "ids_query": """
            SELECT doc_id FROM documents
            WHERE doc_id IN (3, 7, 450, 999999999) ORDER BY doc_id
        """,
        "constant_score_query": """
            SELECT DISTINCT doc_id, printf('%.4f', 1.5) AS score
            FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok = 'hash' ORDER BY doc_id
        """,
        "simple_query_string": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents)),
            phrase AS (
              SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
              WHERE a.tok = 'hash' AND b.tok = 'join' AND b.p = a.p + 1),
            pre AS (SELECT DISTINCT doc_id FROM tok WHERE tok LIKE 'str%'),
            neg AS (SELECT DISTINCT doc_id FROM tok WHERE tok = 'batch')
            SELECT doc_id FROM phrase
            UNION
            SELECT doc_id FROM pre WHERE doc_id NOT IN (SELECT doc_id FROM neg)
            ORDER BY doc_id
        """,
        "distance_feature": """
            WITH cand AS (
              SELECT event_id, ts FROM events WHERE event_type = 'click'),
            scored AS (
              SELECT event_id,
                     2.0 * 259200000.0 / (259200000.0 + CAST(abs(
                       epoch_ms(ts) - epoch_ms(TIMESTAMP '2024-01-15 00:00:00')
                     ) AS DOUBLE)) AS score
              FROM cand)
            SELECT event_id,
                   CAST(row_number() OVER (ORDER BY score DESC, event_id)
                        AS BIGINT) AS rank,
                   printf('%.6f', score) AS score
            FROM scored ORDER BY scored.score DESC, event_id LIMIT 10
        """,
        "script_score": """
            WITH cand AS (
              SELECT DISTINCT d.doc_id, d.n_chars FROM documents d,
                unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok = 'hash'),
            scored AS (
              SELECT doc_id, ln(1.0 + CAST(n_chars AS DOUBLE)) AS score
              FROM cand)
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank,
                   printf('%.4f', score) AS score
            FROM scored ORDER BY scored.score DESC, doc_id LIMIT 10
        """,
        "span_multi_query": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok LIKE 'jo%'
              AND (b.p - a.p) BETWEEN 1 AND 3
            ORDER BY a.doc_id
        """,
        "field_masking_span": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok = 'join'
              AND b.p = a.p + 1 AND b.p < 4
            ORDER BY a.doc_id
        """,
        "span_or_query": """
            SELECT DISTINCT doc_id FROM documents d,
              unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok IN ('merge', 'sort') ORDER BY doc_id
        """,
        "span_first_query": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT doc_id FROM tok
            WHERE tok = 'hash' AND p + 1 <= 5 ORDER BY doc_id
        """,
        "span_not_query": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a
            WHERE a.tok = 'hash' AND NOT EXISTS (
              SELECT 1 FROM tok b WHERE b.doc_id = a.doc_id
                AND b.tok = 'join' AND b.p BETWEEN a.p - 1 AND a.p + 1)
            ORDER BY a.doc_id
        """,
        "span_containing_query": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents)),
            spans AS (
              SELECT h.doc_id, h.p AS s0, min(st.p) AS e0
              FROM tok h JOIN tok st
                ON st.doc_id = h.doc_id AND st.tok = 'stream' AND st.p > h.p
              WHERE h.tok = 'hash'
              GROUP BY h.doc_id, h.p
              HAVING (min(st.p) - h.p + 1) - 2 <= 5)
            SELECT DISTINCT s.doc_id FROM spans s JOIN tok j
              ON j.doc_id = s.doc_id AND j.tok = 'join'
            WHERE j.p BETWEEN s.s0 AND s.e0
            ORDER BY s.doc_id
        """,
        "intervals_query": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok = 'stream'
              AND (b.p - a.p) BETWEEN 1 AND 3
            ORDER BY a.doc_id
        """,
        "intervals_any_of": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT doc_id FROM (
              SELECT a.doc_id FROM tok a JOIN tok b USING (doc_id)
              WHERE a.tok = 'hash' AND b.tok = 'join'
                AND (b.p - a.p) = 1
              UNION ALL
              SELECT a.doc_id FROM tok a JOIN tok b USING (doc_id)
              WHERE a.tok = 'merge' AND b.tok = 'sort'
                AND abs(b.p - a.p) BETWEEN 1 AND 2)
            ORDER BY doc_id
        """,
        "agg_auto_date_histogram": """
            WITH c AS (
              SELECT count(DISTINCT date_trunc('year', ts))   AS y,
                     count(DISTINCT date_trunc('month', ts))  AS mo,
                     count(DISTINCT date_trunc('week', ts))   AS w,
                     count(DISTINCT date_trunc('day', ts))    AS d,
                     count(DISTINCT date_trunc('hour', ts))   AS h,
                     count(DISTINCT date_trunc('minute', ts)) AS mi
              FROM events),
            sel AS (
              -- ladder year->minute, break at the FIRST overflowing unit
              SELECT CASE WHEN y > 10 THEN 'year'
                          WHEN mo > 10 THEN 'year'
                          WHEN w > 10 THEN 'month'
                          WHEN d > 10 THEN 'week'
                          WHEN h > 10 THEN 'day'
                          WHEN mi > 10 THEN 'hour'
                          ELSE 'minute' END AS unit
              FROM c)
            SELECT strftime(CASE (SELECT unit FROM sel)
                     WHEN 'year' THEN date_trunc('year', ts)
                     WHEN 'month' THEN date_trunc('month', ts)
                     WHEN 'week' THEN date_trunc('week', ts)
                     WHEN 'day' THEN date_trunc('day', ts)
                     WHEN 'hour' THEN date_trunc('hour', ts)
                     ELSE date_trunc('minute', ts) END,
                     '%Y-%m-%d %H:%M:%S') AS "key",
                   count(*) AS doc_count,
                   (SELECT unit FROM sel) AS interval
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "intervals_all_of_gaps": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id
            FROM tok a JOIN tok b USING (doc_id) JOIN tok c USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok = 'join' AND b.p = a.p + 1
              AND c.tok = 'stream'
              AND c.p >= a.p + 2 AND c.p - a.p <= 4
            ORDER BY a.doc_id
        """,
        "intervals_filter": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents)),
            spans AS (
              SELECT a.doc_id, a.p AS b, c.p AS e
              FROM tok a JOIN tok c USING (doc_id)
              WHERE a.tok = 'hash' AND c.tok = 'stream'
                AND c.p > a.p AND c.p - a.p <= 3),
            minimal AS (
              SELECT * FROM spans s WHERE NOT EXISTS (
                SELECT 1 FROM spans t
                WHERE t.doc_id = s.doc_id AND t.b >= s.b AND t.e <= s.e
                  AND (t.b <> s.b OR t.e <> s.e))),
            kept AS (
              SELECT DISTINCT m.doc_id FROM minimal m WHERE NOT EXISTS (
                SELECT 1 FROM tok j
                WHERE j.doc_id = m.doc_id AND j.tok = 'join'
                  AND j.p BETWEEN m.b AND m.e))
            SELECT doc_id FROM kept ORDER BY doc_id
        """,
        "intervals_prefix_combine": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok LIKE 'ha%' AND b.tok = 'join'
              AND b.p > a.p AND (b.p - a.p + 1) - 2 <= 1
            ORDER BY a.doc_id
        """,
        "span_gap_near": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok = 'stream' AND b.p = a.p + 2
            ORDER BY a.doc_id
        """,
        "match_bool_prefix": """
            SELECT DISTINCT doc_id FROM documents d,
              unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok = 'hash' OR t.tok LIKE 'joi%'
            ORDER BY doc_id
        """,
        "bm25_range_filtered": _bm25_sql("""
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score
            FROM scored sc JOIN documents d USING (doc_id)
            WHERE d.n_chars >= 200 AND d.n_chars < 400"""),
        "phrase_slop": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents))
            SELECT DISTINCT a.doc_id FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tok = 'hash' AND b.tok = 'join'
              AND (b.p - a.p) BETWEEN -1 AND 3
        """,
        "hybrid_rrf": _bm25_sql("""
            , bm AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id)
                       AS r
              FROM scored QUALIFY r <= 100),
            qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id = 0),
            kn AS (
              SELECT vec_id AS doc_id,
                     row_number() OVER (ORDER BY
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              (SELECT v FROM qv)) DESC,
                       vec_id) AS r
              FROM embeddings QUALIFY r <= 100),
            fused AS (
              SELECT coalesce(bm.doc_id, kn.doc_id) AS doc_id,
                     coalesce(1.0 / (60 + bm.r), 0)
                       + coalesce(1.0 / (60 + kn.r), 0) AS rrf,
                     coalesce(bm.r, 0) AS bm25_rank,
                     coalesce(kn.r, 0) AS knn_rank
              FROM bm FULL OUTER JOIN kn ON bm.doc_id = kn.doc_id)
            SELECT doc_id, printf('%.6f', rrf) AS rrf_score,
                   CAST(bm25_rank AS BIGINT) AS bm25_rank,
                   CAST(knn_rank AS BIGINT) AS knn_rank,
                   CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
                        AS BIGINT) AS rank
            FROM fused ORDER BY rrf DESC, doc_id LIMIT 10"""),
        "hybrid_normalized": _bm25_sql("""
            , bm AS (
              SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC, doc_id) AS r
              FROM scored QUALIFY r <= 100),
            bmn AS (
              SELECT doc_id,
                     CASE WHEN max(score) OVER () = min(score) OVER ()
                          THEN 1.0
                          ELSE greatest(
                            (score - min(score) OVER ())
                            / (max(score) OVER () - min(score) OVER ()),
                            0.001)
                     END AS ns
              FROM bm),
            qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id = 0),
            kn AS (
              SELECT vec_id AS doc_id,
                     list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT v FROM qv)) AS score,
                     row_number() OVER (ORDER BY
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              (SELECT v FROM qv)) DESC,
                       vec_id) AS r
              FROM embeddings QUALIFY r <= 100),
            knn2 AS (
              SELECT doc_id,
                     CASE WHEN max(score) OVER () = min(score) OVER ()
                          THEN 1.0
                          ELSE greatest(
                            (score - min(score) OVER ())
                            / (max(score) OVER () - min(score) OVER ()),
                            0.001)
                     END AS ns
              FROM kn),
            fused AS (
              SELECT coalesce(b.doc_id, k.doc_id) AS doc_id,
                     coalesce(b.ns, 0) AS bm25_norm,
                     coalesce(k.ns, 0) AS knn_norm,
                     (coalesce(0.7 * b.ns, 0) + coalesce(0.3 * k.ns, 0))
                     / (CASE WHEN b.doc_id IS NULL THEN 0 ELSE 0.7 END
                        + CASE WHEN k.doc_id IS NULL THEN 0 ELSE 0.3 END)
                       AS score
              FROM bmn b FULL OUTER JOIN knn2 k ON b.doc_id = k.doc_id)
            SELECT doc_id, printf('%.5f', bm25_norm) AS bm25_norm,
                   printf('%.5f', knn_norm) AS knn_norm,
                   printf('%.5f', score) AS score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank
            FROM fused ORDER BY score DESC, doc_id LIMIT 10"""),
        "dsl_hybrid_query": _bm25_sql("""
            , qterms2(term, boost) AS
                (VALUES ('sort', 1.0), ('merge', 1.0), ('batch', 1.0)),
            scored2 AS (
              SELECT tf.doc_id,
                     SUM(qt.boost
                         * ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
                         * (1.2 + 1.0) * tf.tf
                         / (tf.tf + 1.2 * (1 - 0.75
                                           + 0.75 * dlq.dl_q / c.avgdl)))
                       AS score
              FROM qterms2 qt
              JOIN df  ON df.token = qt.term
              JOIN tf  ON tf.token = qt.term
              JOIN dlq ON dlq.doc_id = tf.doc_id
              CROSS JOIN consts c
              GROUP BY tf.doc_id),
            l1 AS (SELECT doc_id, score,
                          row_number() OVER (ORDER BY score DESC, doc_id)
                            AS r
                   FROM scored QUALIFY r <= 100),
            l2 AS (SELECT doc_id, score,
                          row_number() OVER (ORDER BY score DESC, doc_id)
                            AS r
                   FROM scored2 QUALIFY r <= 100),
            n1 AS (SELECT doc_id,
                          CASE WHEN max(score) OVER () = min(score) OVER ()
                               THEN 1.0
                               ELSE greatest(
                                 (score - min(score) OVER ())
                                 / (max(score) OVER ()
                                    - min(score) OVER ()), 0.001)
                          END AS ns
                   FROM l1),
            n2 AS (SELECT doc_id,
                          CASE WHEN max(score) OVER () = min(score) OVER ()
                               THEN 1.0
                               ELSE greatest(
                                 (score - min(score) OVER ())
                                 / (max(score) OVER ()
                                    - min(score) OVER ()), 0.001)
                          END AS ns
                   FROM l2),
            fused AS (
              SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                     (coalesce(0.6 * a.ns, 0) + coalesce(0.4 * b.ns, 0))
                     / (CASE WHEN a.doc_id IS NULL THEN 0 ELSE 0.6 END
                        + CASE WHEN b.doc_id IS NULL THEN 0 ELSE 0.4 END)
                       AS score
              FROM n1 a FULL OUTER JOIN n2 b ON a.doc_id = b.doc_id)
            SELECT doc_id, printf('%.5f', score) AS score
            FROM fused ORDER BY score DESC, doc_id LIMIT 10"""),
        "dedup_lines": """
            WITH lines AS (
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS line,
                     generate_subscripts(string_split(text, ' '), 1) AS ord
              FROM documents),
            ranked AS (
              SELECT doc_id, ord, line,
                     row_number() OVER (PARTITION BY line
                                        ORDER BY doc_id, ord) AS rn
              FROM lines),
            agg AS (
              SELECT doc_id,
                     string_agg(line, ' ' ORDER BY ord)
                       FILTER (WHERE rn = 1) AS text,
                     count(*) FILTER (WHERE rn > 1) AS removed
              FROM ranked GROUP BY doc_id)
            SELECT d.doc_id, coalesce(a.text, '') AS text,
                   CAST(coalesce(a.removed, 0) AS BIGINT) AS lines_removed
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """,
        "agg_ip_prefix": """
            WITH ips AS (
              SELECT ((10 * 16777216) + (user_id % 256) * 65536
                      + (event_id % 256) * 256 + 1) // 4096 * 4096 AS net
              FROM events)
            SELECT printf('%d.%d.%d.%d', net // 16777216,
                          (net // 65536) % 256, (net // 256) % 256,
                          net % 256) AS key,
                   CAST(count(*) AS BIGINT) AS doc_count
            FROM ips GROUP BY net ORDER BY net
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0),
            sims AS (
              SELECT vec_id,
                     list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) AS sim
              FROM embeddings)
            SELECT vec_id, printf('%.5f', sim) AS score,
                   CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT)
                     AS rank
            FROM sims ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "normalizer_term": """
            SELECT doc_id FROM documents
            WHERE lower(lang) = lower('EN') ORDER BY doc_id
        """,
        "termvectors": f"""
            WITH tok AS (
              SELECT DISTINCT d.doc_id, t.tok AS token
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}
            ),
            one AS (SELECT list_filter(string_split(text, ' '),
                                       x -> x <> '') AS l
                    FROM documents WHERE doc_id = 42),
            tv AS (SELECT unnest(l) AS term,
                          generate_subscripts(l, 1) - 1 AS pos
                   FROM one),
            dfv AS (SELECT token, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY token)
            SELECT tv.term, count(*) AS term_freq,
                   array_to_string(list_sort(list(tv.pos)), ',')
                     AS positions,
                   (SELECT df FROM dfv WHERE dfv.token = tv.term)
                     AS doc_freq
            FROM tv WHERE tv.term NOT IN {STOP}
            GROUP BY tv.term ORDER BY tv.term
        """,
        "pack_sequences": """
            WITH c AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split(text, ' ')) END
                       AS n_tokens,
                     doc_id // 1000 AS grp
              FROM documents),
            w AS (
              SELECT doc_id, n_tokens, grp,
                     coalesce(sum(n_tokens) OVER (
                       PARTITION BY grp ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS excl
              FROM c)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(grp AS BIGINT) AS "group",
                   CAST(excl // 512 AS BIGINT) AS seq,
                   CAST(excl % 512 AS BIGINT) AS "offset"
            FROM w ORDER BY doc_id
        """,
        "stratified_sample": """
            WITH r AS (
              SELECT doc_id, source,
                     CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                          WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1
                          ELSE 0.02 END AS rate,
                     (CAST(doc_id AS UBIGINT) * 2654435761)
                       % 4294967296 AS h
              FROM documents)
            SELECT doc_id, source FROM r
            WHERE CAST(h AS DOUBLE) < rate * 4294967296.0
            ORDER BY doc_id
        """,
        "dedup_substring_stats": f"""
            WITH tk AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '),
                                 x -> x <> '' AND x NOT IN {STOP}) AS l
              FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(l[i.i:i.i+7], ' ') AS gram
              FROM tk, unnest(generate_series(1, len(l) - 7)) AS i(i)),
            dup AS (SELECT gram FROM g GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
            per AS (
              SELECT g.doc_id,
                     CAST(count(*) AS BIGINT) AS n_windows,
                     CAST(count(*) FILTER (g.gram IN (SELECT gram
                                                      FROM dup))
                          AS BIGINT) AS n_dup_windows
              FROM g GROUP BY g.doc_id)
            SELECT doc_id, n_windows, n_dup_windows FROM per
            WHERE n_dup_windows > 0 ORDER BY doc_id
        """,
        "decontaminate": f"""
            WITH tk AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '),
                                 x -> x <> '' AND x NOT IN {STOP}) AS l
              FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(l[i.i:i.i+7], ' ') AS gram
              FROM tk, unnest(generate_series(1, len(l) - 7)) AS i(i)),
            bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 500 = 0)
            SELECT DISTINCT g.doc_id FROM g
            WHERE g.gram IN (SELECT gram FROM bg)
            ORDER BY g.doc_id
        """,
        "agg_terms_partition": """
            SELECT source, count(*) AS doc_count
            FROM documents
            WHERE regexp_full_match(source, 'src.*')
              AND NOT regexp_full_match(source, 'src9')
              AND ('0x' || substring(md5(source), 1, 8))::UBIGINT % 3 = 1
            GROUP BY source ORDER BY source
        """,
        "agg_composite_hist": """
            SELECT printf('%.1f', b) AS value_bucket,
                   event_type, doc_count
            FROM (
              SELECT floor(value / 50.0) * 50.0 AS b, event_type,
                     count(*) AS doc_count
              FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 12)
        """,
        "fetch_docvalue_format": """
            SELECT event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
                   CAST(epoch_ms(ts) AS BIGINT) AS ts_millis
            FROM events WHERE value >= 99.0
            ORDER BY event_id LIMIT 12
        """,
        "dsl_agg_calendar_pct": """
            WITH wk AS (
              SELECT 'week_' || strftime(date_trunc('week', ts),
                                         '%Y-%m-%d') AS stat,
                     CAST(count(*) AS VARCHAR) AS value
              FROM events GROUP BY 1),
            c AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, n FROM (
                    SELECT value AS v, count(*) AS cnt,
                           (SELECT count(*) FROM events) AS n
                    FROM events GROUP BY value)),
            pct AS (
              SELECT 'p25' AS stat, printf('%.4f', (SELECT min(v) FROM c
                WHERE cum >= greatest(1, ceil(0.25 * n)))) AS value
              UNION ALL
              SELECT 'p50', printf('%.4f', (SELECT min(v) FROM c
                WHERE cum >= greatest(1, ceil(0.50 * n))))
              UNION ALL
              SELECT 'p95', printf('%.4f', (SELECT min(v) FROM c
                WHERE cum >= greatest(1, ceil(0.95 * n))))),
            es AS (
              SELECT 'es_count' AS stat,
                     CAST(count(*) AS VARCHAR) AS value FROM events
              UNION ALL
              SELECT 'es_min', printf('%.4f', min(value)) FROM events
              UNION ALL
              SELECT 'es_max', printf('%.4f', max(value)) FROM events
              UNION ALL
              SELECT 'es_sum', printf('%.4f', sum(value)) FROM events
              UNION ALL
              SELECT 'es_avg', printf('%.4f', avg(value)) FROM events
              UNION ALL
              SELECT 'es_std_deviation',
                     printf('%.4f', stddev_pop(value)) FROM events)
            SELECT stat, value FROM (
              SELECT * FROM wk UNION ALL SELECT * FROM pct
              UNION ALL SELECT * FROM es)
            ORDER BY stat
        """,
        "dsl_agg_terms_sub": f"""
            WITH tok AS (
              SELECT DISTINCT d.doc_id, t.tok AS token
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}
            ),
            m AS (SELECT DISTINCT doc_id FROM tok
                  WHERE token IN ('hash', 'join')),
            dm AS (SELECT lang, n_chars
                   FROM documents JOIN m USING (doc_id)),
            per AS (SELECT lang, count(*) AS cnt,
                           avg(CAST(n_chars AS DOUBLE)) AS avg_len,
                           count(*) FILTER (n_chars < 400) AS lo_cnt,
                           max(CAST(n_chars AS DOUBLE))
                             FILTER (n_chars < 400) AS lo_max,
                           count(*) FILTER (n_chars >= 400) AS hi_cnt,
                           max(CAST(n_chars AS DOUBLE))
                             FILTER (n_chars >= 400) AS hi_max
                    FROM dm GROUP BY lang)
            SELECT lang, stat, value FROM (
              SELECT lang, 'count' AS stat, CAST(cnt AS VARCHAR) AS value
              FROM per
              UNION ALL
              SELECT lang, 'avg_len', printf('%.4f', avg_len) FROM per
              UNION ALL
              SELECT lang, 'rg_*-400.0_count', CAST(lo_cnt AS VARCHAR)
              FROM per
              UNION ALL
              SELECT lang, 'rg_*-400.0_max',
                     CASE WHEN lo_max IS NULL THEN 'null'
                          ELSE printf('%.1f', lo_max) END FROM per
              UNION ALL
              SELECT lang, 'rg_400.0-*_count', CAST(hi_cnt AS VARCHAR)
              FROM per
              UNION ALL
              SELECT lang, 'rg_400.0-*_max',
                     CASE WHEN hi_max IS NULL THEN 'null'
                          ELSE printf('%.1f', hi_max) END FROM per)
            ORDER BY lang, stat
        """,
        "rank_features_query": """
            WITH v AS (
              SELECT event_id,
                     CAST(regexp_extract(props, '"k":\s*(-?[0-9.]+)', 1)
                          AS DOUBLE) AS k
              FROM events
              WHERE regexp_extract(props, '"k":\s*(-?[0-9.]+)', 1) <> '')
            SELECT event_id,
                   CAST(row_number() OVER (
                     ORDER BY k / (k + 50.0) DESC, event_id) AS BIGINT)
                     AS rank,
                   printf('%.6f', k / (k + 50.0)) AS score
            FROM v ORDER BY rank LIMIT 10
        """,
        "murmur3_field": """
            SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_hashes
            FROM documents
        """,
        "mtermvectors": f"""
            WITH tok AS (
              SELECT DISTINCT d.doc_id, t.tok AS token
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}
            ),
            sel AS (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       x -> x <> '') AS l
                    FROM documents WHERE doc_id IN (7, 42, 99)),
            tv AS (SELECT doc_id, unnest(l) AS term,
                          generate_subscripts(l, 1) - 1 AS pos
                   FROM sel),
            dfv AS (SELECT token, count(DISTINCT doc_id) AS df
                    FROM tok GROUP BY token)
            SELECT tv.doc_id, tv.term, count(*) AS term_freq,
                   array_to_string(list_sort(list(tv.pos)), ',')
                     AS positions,
                   (SELECT df FROM dfv WHERE dfv.token = tv.term)
                     AS doc_freq
            FROM tv WHERE tv.term NOT IN {STOP}
            GROUP BY tv.doc_id, tv.term ORDER BY tv.doc_id, tv.term
        """,
        "dsl_agg_hist_range_card": f"""
            WITH tok AS (
              SELECT DISTINCT d.doc_id, t.tok AS token
              FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}
            ),
            m AS (SELECT DISTINCT doc_id FROM tok
                  WHERE token IN ('hash', 'join')),
            dm AS (SELECT n_chars, lang FROM documents JOIN m USING (doc_id)),
            hb AS (SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS k,
                          count(*) AS c
                   FROM dm GROUP BY 1),
            lim AS (SELECT min(k) AS lo, max(k) AS hi FROM hb),
            hist AS (
              SELECT 'h' AS agg, CAST(gs.g AS VARCHAR) AS "key",
                     CAST(coalesce(hb.c, 0) AS VARCHAR) AS "value"
              FROM (SELECT unnest(generate_series((SELECT lo FROM lim),
                                                  (SELECT hi FROM lim),
                                                  100)) AS g) gs
              LEFT JOIN hb ON hb.k = gs.g
            ),
            rg AS (
              SELECT 'rg' AS agg, '*-300' AS "key",
                     CAST(count(*) FILTER (WHERE n_chars < 300) AS VARCHAR)
                       AS "value" FROM dm
              UNION ALL
              SELECT 'rg', '300-600',
                     CAST(count(*) FILTER (WHERE n_chars >= 300
                                           AND n_chars < 600) AS VARCHAR)
              FROM dm
              UNION ALL
              SELECT 'rg', '600-*',
                     CAST(count(*) FILTER (WHERE n_chars >= 600) AS VARCHAR)
              FROM dm
            ),
            card AS (SELECT 'card' AS agg, 'lang' AS "key",
                            CAST(count(DISTINCT lang) AS VARCHAR) AS "value"
                     FROM dm)
            SELECT * FROM hist UNION ALL SELECT * FROM rg
            UNION ALL SELECT * FROM card ORDER BY agg, "key"
        """,
        "dsl_request_aggs": _bm25_sql("""
            , m AS (SELECT DISTINCT doc_id FROM tok
                    WHERE token IN ('hash', 'join'))
            SELECT 'by_lang' AS agg, d.lang AS key,
                   CAST(count(*) AS VARCHAR) AS value
            FROM documents d JOIN m USING (doc_id) GROUP BY d.lang
            UNION ALL
            SELECT 'chars', 'count', CAST(count(*) AS VARCHAR)
            FROM documents d JOIN m USING (doc_id)
            UNION ALL
            SELECT 'chars', u.k, printf('%.4f', u.v) FROM (
              SELECT unnest(['min','max','sum','avg']) AS k,
                     unnest([CAST(min(n_chars) AS DOUBLE),
                             CAST(max(n_chars) AS DOUBLE),
                             CAST(sum(n_chars) AS DOUBLE),
                             sum(n_chars) / CAST(count(*) AS DOUBLE)]) AS v
              FROM documents d JOIN m USING (doc_id)) u
            UNION ALL
            SELECT 'global', 'doc_count',
                   CAST((SELECT count(*) FROM documents) AS VARCHAR)
            UNION ALL
            SELECT 'global.avg_chars', 'value',
                   printf('%.4f', (SELECT sum(n_chars)
                                   / CAST(count(*) AS DOUBLE)
                                   FROM documents))
            UNION ALL
            SELECT 'hit', CAST(rn AS VARCHAR), CAST(doc_id AS VARCHAR)
            FROM (SELECT sc.doc_id,
                         row_number() OVER (ORDER BY sc.score DESC,
                                            sc.doc_id) AS rn
                  FROM scored sc JOIN documents d USING (doc_id)
                  WHERE d.lang = 'en') WHERE rn <= 5""",
            query_terms=["hash", "join"]),
        "agg_percentiles_hdr_price": """
            WITH e0t AS (
              SELECT l_extendedprice AS x,
                     CAST(floor(log2(l_extendedprice)) AS BIGINT) AS e0
              FROM lineitem),
            et AS (
              SELECT x, CASE WHEN pow(2, e0) > x THEN e0 - 1
                             WHEN pow(2, e0 + 1) <= x THEN e0 + 1
                             ELSE e0 END AS e
              FROM e0t),
            q AS (
              SELECT floor(x / pow(2, e - 10)) * pow(2, e - 10) AS v
              FROM et),
            ranked AS (
              SELECT v, row_number() OVER (ORDER BY v) AS rn,
                     count(*) OVER () AS n
              FROM q)
            SELECT
              printf('%.6f', max(CASE WHEN rn = CAST(greatest(1.0,
                ceil(25.0 / 100.0 * n)) AS BIGINT) THEN v END)) AS p25,
              printf('%.6f', max(CASE WHEN rn = CAST(greatest(1.0,
                ceil(50.0 / 100.0 * n)) AS BIGINT) THEN v END)) AS p50,
              printf('%.6f', max(CASE WHEN rn = CAST(greatest(1.0,
                ceil(75.0 / 100.0 * n)) AS BIGINT) THEN v END)) AS p75,
              printf('%.6f', max(CASE WHEN rn = CAST(greatest(1.0,
                ceil(99.0 / 100.0 * n)) AS BIGINT) THEN v END)) AS p99
            FROM ranked
        """,
        "agg_terms_order": """
            SELECT l_returnflag, count(*) AS doc_count,
                   printf('%.2f', sum(l_quantity)) AS qty_sum
            FROM lineitem GROUP BY l_returnflag
            ORDER BY sum(l_quantity) DESC, l_returnflag LIMIT 3
        """,
        "field_caps": """
            SELECT * FROM (VALUES
              ('doc_id',  'long',    TRUE, TRUE),
              ('lang',    'keyword', TRUE, TRUE),
              ('n_chars', 'long',    TRUE, TRUE),
              ('source',  'keyword', TRUE, TRUE),
              ('text',    'text',    TRUE, FALSE))
              AS t(field, type, searchable, aggregatable)
            ORDER BY field
        """,
        "validate_query": """
            SELECT * FROM (VALUES
              ('good_bool', TRUE),
              ('multi_field_term', FALSE),
              ('unknown_kind', FALSE)) AS t(check_name, valid)
            ORDER BY check_name
        """,
        "agg_significant_text_dedup": f"""
            WITH uniq AS (
              SELECT arg_min(doc_id, doc_id) AS doc_id,
                     arg_min(lang, doc_id) AS lang, text
              FROM documents GROUP BY text),
            doc_tok AS (
              SELECT DISTINCT d.doc_id, d.lang, t.tok AS term
              FROM uniq d, unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {_stop_sql()}),
            per_term AS (
              SELECT term,
                     CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
                          AS BIGINT) AS fg,
                     count(*) AS bg
              FROM doc_tok GROUP BY term),
            tot AS (SELECT CAST(sum(fg) AS DOUBLE) AS n_fg,
                           CAST(sum(bg) AS DOUBLE) AS n_bg FROM per_term),
            scored AS (
              SELECT p.term, p.fg, p.bg,
                     CASE WHEN p.fg / t.n_fg > p.bg / t.n_bg
                          THEN (p.fg / t.n_fg - p.bg / t.n_bg)
                               * ((p.fg / t.n_fg)
                                  / greatest(p.bg / t.n_bg, 1e-9))
                          ELSE 0.0 END AS score
              FROM per_term p CROSS JOIN tot t)
            SELECT term, fg, bg, printf('%.6f', score) AS score
            FROM scored WHERE score > 0
            ORDER BY scored.score DESC, term LIMIT 10
        """,
        "agg_composite_sub": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS doc_count,
                   printf('%.2f', sum(l_quantity)) AS qty_sum,
                   printf('%.4f', sum(l_extendedprice) / count(*))
                     AS price_avg,
                   printf('%.2f', max(l_discount)) AS disc_max
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            HAVING (l_returnflag, l_linestatus) > ('A', 'F')
            ORDER BY l_returnflag, l_linestatus LIMIT 3
        """,
        "repetition_stats": """
            WITH tok AS (
              SELECT doc_id, u.tok AS tok, u.p AS p FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                         (s, i) -> struct_pack(tok := s, p := i - 1))) AS u
                FROM documents)),
            n AS (SELECT doc_id, count(*) AS n_tokens FROM tok
                  GROUP BY doc_id),
            bi AS (
              SELECT a.doc_id, a.tok || ' ' || b.tok AS g,
                     count(*) AS cnt
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.p = a.p + 1
              GROUP BY a.doc_id, g),
            topbi AS (SELECT doc_id, max(cnt) AS top FROM bi
                      GROUP BY doc_id),
            tri AS (
              SELECT a.doc_id,
                     a.tok || ' ' || b.tok || ' ' || c.tok AS g,
                     count(*) AS cnt
              FROM tok a
              JOIN tok b ON a.doc_id = b.doc_id AND b.p = a.p + 1
              JOIN tok c ON a.doc_id = c.doc_id AND c.p = a.p + 2
              GROUP BY a.doc_id, g),
            duptri AS (
              SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                       AS dup
              FROM tri GROUP BY doc_id)
            SELECT n.doc_id, n.n_tokens,
                   CASE WHEN n.n_tokens < 2 THEN 0.0
                        ELSE CAST(topbi.top AS DOUBLE)
                             / (n.n_tokens - 1) END AS top_bigram_frac,
                   CASE WHEN n.n_tokens < 3 THEN 0.0
                        ELSE CAST(coalesce(duptri.dup, 0) AS DOUBLE)
                             / (n.n_tokens - 2) END AS dup_trigram_frac
            FROM n
            LEFT JOIN topbi USING (doc_id)
            LEFT JOIN duptri USING (doc_id)
            ORDER BY n.doc_id
        """,
        "pii_redact": _pii_sql(),
        "date_math_range": """
            SELECT event_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <= TIMESTAMP '2024-01-17 23:59:59.999999'
            ORDER BY event_id
        """,
        "knn_query": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 3),
            sims AS (
              SELECT vec_id AS doc_id,
                     list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) AS sim
              FROM embeddings)
            SELECT doc_id, printf('%.4f', sim) AS score,
                   CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
                        AS BIGINT) AS rank
            FROM sims ORDER BY sim DESC, doc_id LIMIT 10
        """,
        "knn_radial_query": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 3),
            sims AS (
              SELECT vec_id AS doc_id,
                     list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) AS sim
              FROM embeddings)
            SELECT doc_id, printf('%.4f', sim) AS score
            FROM sims WHERE sim >= 0.2 ORDER BY sim DESC, doc_id
        """,
        "knn_filtered_query": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 3),
            sims AS (
              SELECT e.vec_id AS doc_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) AS sim
              FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
              WHERE d.lang = 'en')
            SELECT doc_id, printf('%.4f', sim) AS score,
                   CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
                        AS BIGINT) AS rank
            FROM sims ORDER BY sim DESC, doc_id LIMIT 10
        """,
        "wildcard_field_query": """
            SELECT doc_id FROM documents
            WHERE source LIKE 'src1_' ORDER BY doc_id
        """,
        "ip_range_field": """
            WITH r AS (SELECT event_id, event_id % 128 AS b,
                              user_id % 64 AS w FROM events)
            SELECT * FROM (
              SELECT 'contains' AS relation, event_id FROM r
              WHERE b <= 64 AND b + w >= 127
              UNION ALL
              SELECT 'intersects', event_id FROM r WHERE b + w >= 64
              UNION ALL
              SELECT 'within', event_id FROM r
              WHERE b >= 64 AND b + w <= 127)
            ORDER BY relation, event_id
        """,
        "ip_cidr_term": """
            WITH ips(event_id, b) AS (
              SELECT event_id, user_id % 256 FROM events)
            SELECT event_id FROM ips
            WHERE b BETWEEN 96 AND 111 ORDER BY event_id
        """,
        "range_field_query": """
            WITH r AS (
              SELECT event_id, value AS lo,
                     value + (user_id % 10) AS hi
              FROM events)
            SELECT 'intersects' AS relation, event_id FROM r
            WHERE lo <= 12.0 AND hi >= 5.0
            UNION ALL
            SELECT 'within', event_id FROM r
            WHERE lo >= 5.0 AND hi <= 12.0
            UNION ALL
            SELECT 'contains', event_id FROM r
            WHERE lo <= 5.0 AND hi >= 12.0
            ORDER BY relation, event_id
        """,
        "size_field": """
            WITH s AS (SELECT doc_id,
                              octet_length(encode(text))
                              + octet_length(encode(lang)) AS _size
                       FROM documents)
            SELECT doc_id, _size FROM s
            WHERE _size BETWEEN 400 AND 600 ORDER BY doc_id
        """,
        "annotated_text_term": """
            SELECT term, doc_id FROM (
              SELECT 'ent3' AS term, doc_id FROM documents
              WHERE doc_id % 5 = 3
              UNION ALL
              SELECT 'topic' AS term, doc_id FROM documents)
            ORDER BY term, doc_id
        """,
        "copy_to_match": """
            SELECT term, doc_id FROM (
              SELECT 'fr' AS term, doc_id FROM documents
              WHERE lang = 'fr' OR source = 'fr'
                 OR regexp_matches(lower(text), '\\bfr\\b')
              UNION ALL
              SELECT 'src3' AS term, doc_id FROM documents
              WHERE lang = 'src3' OR source = 'src3'
                 OR regexp_matches(lower(text), '\\bsrc3\\b'))
            ORDER BY term, doc_id
        """,
        "unsigned_long_range": """
            WITH u AS (SELECT event_id,
                              CAST(18446744073709551615 AS UBIGINT)
                              - CAST(event_id AS UBIGINT) AS u
                       FROM events)
            SELECT event_id, CAST(u AS VARCHAR) AS u
            FROM u
            WHERE u >= CAST(18446744073709551615 AS UBIGINT) - 500
              AND u <  CAST(18446744073709551615 AS UBIGINT) - 100
            ORDER BY u LIMIT 10
        """,
        "scaled_float_agg": """
            WITH q AS (SELECT floor(l_tax * 10.0 + 0.5) / 10.0 AS v
                       FROM lineitem)
            SELECT count(*) AS count,
                   printf('%.4f', min(v)) AS min,
                   printf('%.4f', max(v)) AS max,
                   printf('%.4f', sum(v)) AS sum,
                   printf('%.4f', sum(v) / count(*)) AS avg
            FROM q
        """,
        "token_count_range": f"""
            WITH tok AS (
              SELECT d.doc_id, t.tok AS token
              FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}),
            tc AS (SELECT doc_id, count(*) AS token_count
                   FROM tok GROUP BY doc_id)
            SELECT doc_id, token_count FROM tc
            WHERE token_count BETWEEN 40 AND 60 ORDER BY doc_id
        """,
        "match_only_text_query": f"""
            WITH tok AS (
              SELECT DISTINCT d.doc_id, t.tok AS token
              FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}),
            df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
            qterms(term) AS (VALUES ('hash'), ('join'), ('stream')),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT tok.doc_id,
                   printf('%.4f', SUM(ln(1 + (n.n_docs - df.df + 0.5)
                                           / (df.df + 0.5)))) AS score
            FROM tok JOIN qterms q ON tok.token = q.term
            JOIN df ON df.token = tok.token CROSS JOIN n
            GROUP BY tok.doc_id ORDER BY tok.doc_id
        """,
        "constant_keyword_term": """
            SELECT doc_id FROM documents ORDER BY doc_id
        """,
        "completion_suggest_context": f"""
            WITH tok AS (
              SELECT DISTINCT d.doc_id, d.lang, t.tok AS term
              FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}),
            f AS (SELECT term, count(*) AS df FROM tok
                  WHERE lang IN ('en', 'de') AND term LIKE 's%'
                  GROUP BY term)
            SELECT term AS suggestion, df,
                   CAST(row_number() OVER (ORDER BY df DESC, term)
                        AS BIGINT) AS rank
            FROM f ORDER BY df DESC, term LIMIT 5
        """,
        "completion_suggest_fuzzy": f"""
            WITH tok AS (
              SELECT DISTINCT d.doc_id, t.tok AS term
              FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
              WHERE t.tok <> '' AND t.tok NOT IN {STOP}),
            f AS (SELECT term, count(*) AS df FROM tok
                  WHERE length(term) >= 4 AND (
                        levenshtein('strem', substr(term, 1, 4)) <= 1
                     OR levenshtein('strem', substr(term, 1, 5)) <= 1
                     OR levenshtein('strem', substr(term, 1, 6)) <= 1)
                  GROUP BY term)
            SELECT term AS suggestion, df,
                   CAST(row_number() OVER (ORDER BY df DESC, term)
                        AS BIGINT) AS rank
            FROM f ORDER BY df DESC, term LIMIT 5
        """,
        "flat_object_term": """
            SELECT event_id FROM events
            WHERE json_extract_string(props, '$.k') = '69'
            ORDER BY event_id
        """,
        "agg_reverse_nested": """
            SELECT l.l_returnflag,
                   count(DISTINCT o.o_orderkey) AS doc_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY l.l_returnflag ORDER BY l.l_returnflag
        """,
        "agg_global": """
            SELECT 'query' AS bucket, count(*) AS doc_count,
                   printf('%.4f', sum(l_extendedprice) / count(*)) AS avg
            FROM lineitem WHERE l_returnflag = 'A'
            UNION ALL
            SELECT 'global', count(*),
                   printf('%.4f', sum(l_extendedprice) / count(*))
            FROM lineitem
        """,
        "agg_filter": """
            SELECT count(*) AS doc_count,
                   printf('%.2f', sum(l_quantity)) AS sum,
                   printf('%.4f', sum(l_quantity) / count(*)) AS avg
            FROM lineitem WHERE l_returnflag = 'R'
        """,
        "common_terms_query": _bm25_sql("""
            , low AS (SELECT qt.term FROM qterms qt
                      JOIN df ON df.token = qt.term WHERE df.df <= 100),
            gate AS (SELECT DISTINCT t2.doc_id
                     FROM tok t2 JOIN low ON t2.token = low.term)
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score
            FROM scored sc JOIN gate USING (doc_id)
            ORDER BY sc.score DESC, sc.doc_id LIMIT 10""",
            query_terms=["dup", "scan", "batch"]),
        "geo_polygon": """
            WITH pts AS (
              SELECT event_id,
                     (user_id % 180) - 89.5 AS lat,
                     (event_id % 360) - 179.5 AS lon
              FROM events)
            SELECT event_id FROM pts
            WHERE (0.3 - (-44.9)) * (lat - 0.1)
                    - ((-29.8) - 0.1) * (lon - (-44.9)) > 0
              AND (45.7 - 0.3) * (lat - (-29.8))
                    - (0.2 - (-29.8)) * (lon - 0.3) > 0
              AND (0.1 - 45.7) * (lat - 0.2)
                    - (30.3 - 0.2) * (lon - 45.7) > 0
              AND ((-44.9) - 0.1) * (lat - 30.3)
                    - (0.1 - 30.3) * (lon - 0.1) > 0
            ORDER BY event_id
        """,
        "geo_shape_query": """
            WITH pts AS (
              SELECT event_id,
                     (user_id % 180) - 89.5 AS lat,
                     (event_id % 360) - 179.5 AS lon
              FROM events),
            flags AS (
              SELECT event_id,
                     (lat <= 35.7 AND lat >= -25.9
                      AND lon >= -60.3 AND lon <= 20.1) AS inside
              FROM pts)
            SELECT 'intersects' AS relation, event_id FROM flags
            WHERE inside
            UNION ALL
            SELECT 'disjoint', event_id FROM flags WHERE NOT inside
            ORDER BY relation, event_id
        """,
        "dsl_search": _bm25_sql("""
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score, d.lang
            FROM scored sc JOIN documents d USING (doc_id)
            WHERE d.n_chars >= 200
              AND NOT EXISTS (SELECT 1 FROM tok m
                              WHERE m.doc_id = sc.doc_id
                                AND m.token = 'merge')
            ORDER BY sc.score DESC, sc.doc_id LIMIT 10"""),
        "dsl_search_after_score": _bm25_sql("""
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score
            FROM scored sc
            ORDER BY sc.score DESC, sc.doc_id
            LIMIT 10 OFFSET 10"""),
        "dsl_search_after_sort": _bm25_sql("""
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score, d.n_chars
            FROM scored sc JOIN documents d USING (doc_id)
            ORDER BY d.n_chars DESC, sc.doc_id
            LIMIT 10 OFFSET 10"""),
        "dsl_count": _bm25_sql("""
            SELECT CAST(count(DISTINCT sc.doc_id) AS BIGINT) AS count
            FROM scored sc JOIN documents d USING (doc_id)
            WHERE d.n_chars >= 200 AND d.lang <> 'zh'"""),
        "ltr_rescore": _bm25_sql("""
            , win AS (
              SELECT sc.doc_id, sc.score, d.n_chars
              FROM scored sc JOIN documents d USING (doc_id)
              ORDER BY sc.score DESC, sc.doc_id LIMIT 50)
            SELECT doc_id,
                   printf('%.4f', 0.6 * score + 0.0005 * n_chars)
                     AS ltr_score
            FROM win
            ORDER BY 0.6 * score + 0.0005 * n_chars DESC, doc_id
            LIMIT 10"""),
        "field_alias_search": """
            SELECT doc_id, n_chars, lang FROM documents
            WHERE n_chars >= 200 AND n_chars < 400 AND lang = 'en'
            ORDER BY n_chars ASC, doc_id ASC LIMIT 15
        """,
        "sort_index_early_term": """
            SELECT DISTINCT doc_id FROM documents d,
                   unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok = 'hash' ORDER BY doc_id LIMIT 12
        """,
        "derived_field_query": """
            SELECT doc_id, n_chars // 100 AS chars_bucket FROM documents
            WHERE n_chars // 100 BETWEEN 2 AND 3
            ORDER BY chars_bucket, doc_id LIMIT 20
        """,
        "wrapper_query": """
            SELECT DISTINCT d.doc_id
            FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
            WHERE t.tok = 'window' AND d.n_chars < 400
        """,
        "search_template": _bm25_sql("""
            SELECT sc.doc_id, printf('%.4f', sc.score) AS score
            FROM scored sc JOIN documents d USING (doc_id)
            WHERE d.lang = 'en'
            ORDER BY sc.score DESC, sc.doc_id LIMIT 10""",
            query_terms=["window", "sort"]),
        "rank_eval_precision": _rankeval_sql("""
            , perq AS (
              SELECT t.query_id,
                     CAST(sum(CASE WHEN r.rating >= 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) AS ms
              FROM top t LEFT JOIN rated r USING (query_id, doc_id)
              GROUP BY t.query_id
            )
            SELECT query_id, printf('%.4f', ms) AS metric_score FROM perq
            UNION ALL
            SELECT '_mean', printf('%.4f', (SELECT avg(ms) FROM perq))"""),
        "rank_eval_ndcg": _rankeval_sql("""
            , dcg AS (
              SELECT t.query_id,
                     sum(CASE WHEN r.rating IS NULL THEN 0
                              ELSE (pow(2, r.rating) - 1) / log2(t.rn + 1)
                         END) AS dcg
              FROM top t LEFT JOIN rated r USING (query_id, doc_id)
              GROUP BY t.query_id
            ),
            idcg AS (
              SELECT query_id,
                     sum((pow(2, rating) - 1) / log2(rn + 1)) AS idcg
              FROM (SELECT query_id, rating,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY rating DESC) AS rn
                    FROM rated)
              WHERE rn <= 10 GROUP BY query_id
            ),
            perq AS (
              SELECT d.query_id,
                     CASE WHEN i.idcg = 0 THEN 0
                          ELSE d.dcg / i.idcg END AS ms
              FROM dcg d JOIN idcg i USING (query_id)
            )
            SELECT query_id, printf('%.4f', ms) AS metric_score FROM perq
            UNION ALL
            SELECT '_mean', printf('%.4f', (SELECT avg(ms) FROM perq))"""),
    }
