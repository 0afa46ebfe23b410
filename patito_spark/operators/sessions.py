"""Sessionization of event streams (gaps-and-islands).

A session is a maximal run of a user's events where each consecutive gap
is ≤ ``gap_seconds``.  Implemented as the classic lag + cumulative-sum
window — ONE shuffle on the user key, spillable per-user sort, all
integer/timestamp arithmetic (bit-exact cross-engine, so the contract
query hash-checks against a DuckDB twin).

Spark also offers ``F.session_window`` for windowed aggregations (and the
streaming variant with watermarks); this operator exists for when the
session id must be attached to EVERY event row — e.g. to feed downstream
per-session features — which session_window's aggregate-only shape can't
do directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_seq",
) -> DataFrame:
    """Append a per-user session sequence number (1-based) to every row.

    A new session starts at a user's first event and whenever the gap
    since their previous event exceeds ``gap_seconds``.  Rows with a NULL
    timestamp sort first (NULLS FIRST) and together form the user's first
    session; the first real-timestamped event after a NULL block opens a
    new session (a gap from an unknown time is itself unknown).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    # lag of a constant distinguishes "no previous row" from "previous row
    # has NULL ts" — without it every row of a NULL-ts block would see
    # prev IS NULL and open its own session
    prev_exists = F.lag(F.lit(1)).over(w)
    # microsecond-exact, timezone-free datetime arithmetic (works for both
    # TIMESTAMP and TIMESTAMP_NTZ; second-truncating casts would disagree
    # across engines on subsecond timestamps)
    gap_us = gap_seconds * 1_000_000
    starts_new = (
        F.when(prev_exists.isNull(), F.lit(1))  # user's first row
        .when(F.col(ts_col).isNull(), F.lit(0))  # NULL block coalesces
        .when(
            prev.isNull()  # first real ts after a NULL block
            | (F.timestamp_diff("MICROSECOND", prev, F.col(ts_col)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col, F.sum(starts_new).over(running).cast("long")
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: ``(user, session_seq, n_events, duration_us)``.

    Duration is in exact integer microseconds (cross-engine reproducible).
    The sessionize window and this groupBy share the user-key partitioning
    — Spark plans one shuffle for both.
    """
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.timestamp_diff(
            "MICROSECOND", F.min(F.col(ts_col)), F.max(F.col(ts_col))
        ).alias("duration_us"),
    )
