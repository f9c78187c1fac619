"""Sources: parquet readers + deterministic synthetic transcript corpus."""

from .transcripts import synthesize_transcripts, write_transcript_corpus, reference_queries

__all__ = ["synthesize_transcripts", "write_transcript_corpus", "reference_queries"]
