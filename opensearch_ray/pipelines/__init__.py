"""End-to-end pipelines."""

from .reindex import reindex
from .flagship import flagship_pipeline
from .training_data import prepare_training_data

__all__ = ["reindex", "flagship_pipeline", "prepare_training_data"]
