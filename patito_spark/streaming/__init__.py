"""Structured Streaming validation."""

from .dedup import dedup_stream
from .rollup import rollup_stream
from .sessions import sessionize_stream
from .validate import flag_violations, validate_stream, windowed_violation_counts

__all__ = [
    "dedup_stream",
    "flag_violations",
    "rollup_stream",
    "sessionize_stream",
    "validate_stream",
    "windowed_violation_counts",
]
