import os

import pytest
import ray

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def transcript_corpus(tmp_path_factory):
    """Seed-fixed ~2k-turn corpus written as 4 parquet files."""
    from opensearch_ray.sources import write_transcript_corpus

    d = tmp_path_factory.mktemp("corpus")
    files = write_transcript_corpus(str(d), n_turns=2000, n_files=4, seed=42)
    return str(d), files


@pytest.fixture(scope="session")
def built_index(transcript_corpus, tmp_path_factory):
    """A merged index over the 2k-turn corpus (hot-term threshold low enough
    that stopword-adjacent common terms exercise salting)."""
    from opensearch_ray.index.build import build_index

    corpus_dir, files = transcript_corpus
    idx = tmp_path_factory.mktemp("index") / "idx"
    manifest = build_index(
        corpus_dir, str(idx), analyzer="transcript",
        num_buckets=8, hot_df_threshold=400, merge=True,
    )
    return manifest
