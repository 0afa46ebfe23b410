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

#: strictly-nesting truncation chain: every bucket at level i is wholly
#: contained in one bucket at level i+1.  ``week`` is deliberately a leaf
#: tacked onto ``day``: a week spans two months, so week→month (or any
#: coarser) would re-aggregate rows into the WRONG bucket silently.
_NESTING_ORDER = (
    "millisecond",
    "second",
    "minute",
    "hour",
    "day",
    "month",
    "quarter",
    "year",
)


def _validate_nesting(levels: Sequence[str]) -> None:
    for fine, coarse in zip(levels, levels[1:]):
        if coarse == "week":
            if fine not in ("millisecond", "second", "minute", "hour", "day"):
                raise ValueError(
                    f"rollup level {fine!r} does not nest into 'week'"
                )
            continue
        if fine == "week":
            raise ValueError(
                "'week' buckets span month/quarter/year boundaries and "
                "cannot be re-aggregated into a coarser level; put 'week' "
                "last or compute it from 'day' in a separate rollup"
            )
        if fine not in _NESTING_ORDER or coarse not in _NESTING_ORDER:
            raise ValueError(f"unknown rollup level in {fine!r} -> {coarse!r}")
        if _NESTING_ORDER.index(fine) >= _NESTING_ORDER.index(coarse):
            raise ValueError(
                f"rollup levels must be finest-first and strictly nesting; "
                f"got {fine!r} -> {coarse!r}"
            )


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

    Floating-point note: re-aggregating double partials accumulates in a
    different order than a direct sum over raw rows, so ``sum_v`` on a
    double column is only approximately equal across engines/runs.  For
    bit-exact results (and for oracle hash gates) pass a decimal
    ``value_col`` — decimal addition is associative, so hierarchical and
    direct sums agree exactly.
    """
    if not levels:
        raise ValueError("levels must name at least one time resolution")
    _validate_nesting(levels)
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
