"""Streaming continuous aggregate: the live path of the hypertable rollup.

Batch ``operators.rollup.time_rollup`` maintains coarser levels by
re-aggregating finer MERGEABLE partials (n / sum / min / max).  This module
keeps the FINEST level current on an unbounded stream: watermarked
tumbling-window partials, emitted exactly once per closed bucket (append
mode).  Because the emitted columns are the same mergeable partials the
batch operator consumes, a pipeline can stream the minute level into a
table and let the batch rollup derive hour/day/week from it without ever
rescanning raw events — the classic continuous-aggregate split.

Averages are intentionally NOT emitted (they don't merge); derive them
downstream as ``sum_v / n`` at whatever level is being read.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_stream"]


def rollup_stream(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "1 minute",
    watermark: Optional[str] = "10 minutes",
    group_cols: Optional[list] = None,
) -> DataFrame:
    """Mergeable per-bucket partials over a (possibly streaming) frame.

    Output: ``[*group_cols,] bucket (window start), n, sum_v, min_v,
    max_v`` — exactly the partial set ``operators.rollup.time_rollup``
    re-aggregates, so the streamed finest level plugs into the batch
    coarser levels unchanged.  On a stream, pair with
    ``.writeStream.outputMode("append")``: a bucket emits once, when the
    watermark passes its end.  ``watermark=None`` runs the identical plan
    on a batch frame (how the parity test pins it against time_rollup).
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    gcols = list(group_cols or [])
    grouped = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.window(F.col(ts_col), window), *[F.col(c) for c in gcols]
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )
    return grouped.select(
        *gcols,
        F.col("window.start").alias("bucket"),
        "n",
        "sum_v",
        "min_v",
        "max_v",
    )
