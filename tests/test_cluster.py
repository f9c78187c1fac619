"""SearchCluster (shard fan-out actors) must equal the local Searcher exactly."""

from opensearch_ray.search import Searcher, SearchCluster
from opensearch_ray.sources import reference_queries


def test_cluster_equals_local(built_index):
    local = Searcher(built_index.index_dir)
    cluster = SearchCluster(built_index.index_dir, num_executors=2)
    try:
        for q in reference_queries():
            want = [(h.docid, h.score) for h in
                    local.search(q["query_text"], k=q["k"])]
            got = [(h.docid, h.score) for h in
                   cluster.search(q["query_text"], k=q["k"])]
            assert got == want, q["query_id"]
    finally:
        cluster.shutdown()
