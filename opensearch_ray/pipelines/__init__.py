"""End-to-end pipelines."""

from .reindex import reindex
from .flagship import flagship_pipeline

__all__ = ["reindex", "flagship_pipeline"]
