"""Streaming exact dedup: the live path of ``operators.dedup``.

Batch exact dedup fingerprints every document and keeps one canonical row
per fingerprint.  On an unbounded ingest stream that exact semantics needs
unbounded state (a fingerprint seen on day 1 must suppress a copy on day
400), so the streaming operator makes the standard bounded trade:
``dropDuplicatesWithinWatermark`` keeps fingerprint state only as long as
the event-time watermark requires — a duplicate arriving within the
watermark horizon of its first copy is suppressed, an older re-crawl is
not.  That matches how crawl ingest actually duplicates (bursts of
re-fetches minutes-to-hours apart), and the state store stays bounded by
the horizon's ingest volume instead of history.

The full-history guarantee stays with the batch path: run
``operators.dedup.exact_dedup`` (or the MinHash/SimHash family) over the
accumulated table in the backfill tier — the classic lambda split, same as
``streaming/rollup.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint

__all__ = ["dedup_stream"]


def dedup_stream(
    df: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    extra_keys: Optional[Sequence[str]] = None,
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Drop near-in-time exact duplicates from a (possibly streaming) frame.

    Every row gets a normalized-text ``fingerprint`` (same
    ``functions.text.doc_fingerprint`` the batch path uses, so batch and
    stream agree on what counts as "the same document"); duplicates of a
    fingerprint (+ *extra_keys*, e.g. a language column) arriving within
    the *watermark* horizon are dropped, first row wins.  State per key is
    retained only until the watermark passes — bounded by horizon volume.

    On a batch frame the same call degrades to plain ``dropDuplicates``
    over the key columns (no watermark semantics apply), which is how the
    parity test pins the key construction against the batch operator.
    """
    keys = [fingerprint_col, *list(extra_keys or [])]
    out = df.withColumn(fingerprint_col, doc_fingerprint(F.col(text_col)))
    if out.isStreaming:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return out.dropDuplicates(keys)
