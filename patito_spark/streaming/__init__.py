"""Structured Streaming validation."""

from .dedup import dedup_stream
from .ingest import (
    compact_stores,
    crawl_ingest_stream,
    read_ingested_corpus,
    read_quarantine,
    read_quarantine_specs,
)
from .rollup import rollup_stream
from .sessions import sessionize_stream
from .validate import flag_violations, validate_stream, windowed_violation_counts

__all__ = [
    "compact_stores",
    "crawl_ingest_stream",
    "dedup_stream",
    "flag_violations",
    "read_ingested_corpus",
    "read_quarantine",
    "read_quarantine_specs",
    "rollup_stream",
    "sessionize_stream",
    "validate_stream",
    "windowed_violation_counts",
]
