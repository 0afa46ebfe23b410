"""Hypertable-style multi-resolution time rollups (continuous aggregates).

The finest level aggregates the raw table ONCE; every coarser level
re-aggregates the finer level's partials — counts, sums, mins and maxes
are mergeable, so the hour level shuffles minute rows and the day level
shuffles hour rows, never rescanning raw data.  This is the TimescaleDB
continuous-aggregate shape expressed as plain DataFrame algebra: at 100 TB
the raw scan happens once regardless of how many resolutions are kept.

Averages are derived (``sum/n``), never stored — stored averages don't
re-aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: coarser-to-the-right ordering is the caller's contract
DEFAULT_LEVELS = ("minute", "hour", "day")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    levels: Sequence[str] = DEFAULT_LEVELS,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Stacked rollup rows: ``(level, bucket, *group_cols, n, sum_v,
    min_v, max_v)`` for every resolution in *levels* (finest first).

    ``n`` counts rows; ``sum/min/max`` skip NULL values (both facts hold
    identically after re-aggregation).
    """
    if not levels:
        raise ValueError("levels must name at least one time resolution")
    gcols = list(group_cols)
    finest = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"), *gcols
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    stacked = finest.withColumn("level", F.lit(levels[0]))
    prev = finest
    for level in levels[1:]:
        prev = (
            prev.groupBy(
                F.date_trunc(level, F.col("bucket")).alias("bucket"), *gcols
            )
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        stacked = stacked.unionByName(prev.withColumn("level", F.lit(level)))
    return stacked.select("level", "bucket", *gcols, "n", "sum_v", "min_v", "max_v")
