"""Sources: parquet readers + deterministic synthetic transcript corpus."""

from .transcripts import synthesize_transcripts, write_transcript_corpus, reference_queries
from .bulk import read_bulk_ndjson, parse_bulk_lines

__all__ = ["synthesize_transcripts", "write_transcript_corpus", "reference_queries"]
