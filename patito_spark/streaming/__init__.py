"""Structured Streaming validation."""

from .validate import flag_violations, validate_stream, windowed_violation_counts

__all__ = ["flag_violations", "validate_stream", "windowed_violation_counts"]
