"""Ingest pipelines: per-document transforms applied before indexing.

Ref: server/ingest/ (IngestService.executeBulkRequest :510, Pipeline.execute
Pipeline.java:131-134, CompoundProcessor.java:58-85 on-failure routing) and
modules/ingest-common/ (one file per processor).
"""

from .processors import PROCESSORS, IngestPipeline, make_processor
from .enrich import UserAgentProcessor, GeoIpProcessor

__all__ = ["PROCESSORS", "IngestPipeline", "make_processor",
           "UserAgentProcessor", "GeoIpProcessor"]
