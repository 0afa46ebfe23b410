"""Streaming sessionization via Spark's NATIVE session window.

The batch operator (``operators.sessions.sessionize``) is gaps-and-islands
over an ordered window; on an unbounded stream the idiomatic Spark shape is
``F.session_window`` + a watermark: state is kept per open session, merged
as events arrive (possibly out of order within the watermark), and a
session is emitted exactly once — when the watermark passes its close.
That is the plan you want at 10^12 events: no global sort, state bounded
by (open sessions x gap), late data handled by the engine.

Boundary semantics vs the batch operator (documented, inherent to the two
definitions): gaps-and-islands keeps an event that arrives EXACTLY
``gap`` seconds after its predecessor in the same session (``> gap``
starts a new one); ``session_window`` windows are half-open
``[start, start + gap)``, so an exactly-``gap`` successor begins a new
session.  Real event-time data (microsecond timestamps) never lands on
the boundary; tests that compare the two avoid it explicitly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sessionize_stream"]


def sessionize_stream(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: Optional[str] = "1 hour",
    *aggs: Column,
) -> DataFrame:
    """Per-user session aggregates over a (possibly streaming) DataFrame.

    Output: one row per closed session — ``user_col, session_start,
    session_end, n_events`` plus any extra ``aggs``.  On a streaming input
    pair with ``.writeStream.outputMode("append")``: sessions emit once
    their close passes the watermark.  Works identically on a batch
    DataFrame (``watermark=None`` to skip the watermark), which is how the
    parity test pins it against the batch gaps-and-islands operator.

    NULL timestamps: ``session_window`` drops them (no window can be
    assigned) — matching the batch operator's documented advice to
    pre-filter NULL event times.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    grouped = df.groupBy(
        F.session_window(F.col(ts_col), gap), F.col(user_col)
    ).agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    agg_names = [c for c in grouped.columns if c not in ("session_window", user_col)]
    return grouped.select(
        F.col(user_col),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *agg_names,
    )
