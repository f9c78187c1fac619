"""opensearch_ray — a Ray-Data-native full-text indexing + search engine.

A from-scratch reimplementation of the *capabilities* of the reference
OpenSearch engine (/root/reference, Java/Lucene) re-expressed Ray-Data-first:

- ``analysis``   — char filters / tokenizers / token filters / analyzers
                   (ref: server/index/analysis, modules/analysis-common)
- ``index``      — inverted-index build: postings codec, norms, segments,
                   checkpoint manifests, merge (ref: server/index/engine,
                   server/index/codec; Lucene IndexWriter semantics)
- ``search``     — BM25 scoring, boolean/term/match/phrase queries, block-max
                   WAND top-k, k-way result merge (ref: server/search/query)
- ``aggs``       — metric / bucket / pipeline aggregations
                   (ref: server/search/aggregations)
- ``ingest``     — ingest processors (ref: server/ingest, modules/ingest-common)
- ``dedup``      — exact + near-duplicate detection (minhash/simhash/jaccard)
- ``textstats``  — language id, quality scoring, token counting, fingerprints
- ``similarity`` — embedding ANN (brute-force cosine + LSH-bucketed)
- ``sources``    — parquet readers + deterministic transcript synthesis
- ``pipelines``  — end-to-end build/search/reindex pipelines

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over zero-copy
Arrow batches; stateful stages are actor pools; wide steps are explicit
groupby/sort shuffles with documented partitioning assumptions.

No module in this package calls ``ray.init()`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.2.0"
