"""Structured Streaming validation."""

from .sessions import sessionize_stream
from .validate import flag_violations, validate_stream, windowed_violation_counts

__all__ = [
    "flag_violations",
    "sessionize_stream",
    "validate_stream",
    "windowed_violation_counts",
]
