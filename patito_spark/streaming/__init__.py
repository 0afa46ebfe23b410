"""Structured Streaming validation."""

from .rollup import rollup_stream
from .sessions import sessionize_stream
from .validate import flag_violations, validate_stream, windowed_violation_counts

__all__ = [
    "flag_violations",
    "rollup_stream",
    "sessionize_stream",
    "validate_stream",
    "windowed_violation_counts",
]
