"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two operators a continuous-crawl validation pipeline needs beyond the
stateless checks in :mod:`.validate`:

- ``dedup_within_watermark`` — thin wrapper over Spark's own
  ``dropDuplicatesWithinWatermark`` (bounded-state streaming uniqueness:
  exact uniqueness over an unbounded stream is unbounded state, so the
  watermark bounds it — the streaming analogue of the batch V7 check).
- ``running_column_stats`` — per-key running statistics (count, null count,
  mean/M2 via Welford) maintained in state across micro-batches, emitting
  one updated row per key per batch.  This is the streaming analogue of the
  batch per-partition column profile (``plans.stats.column_profile``) and
  the template for any custom stateful check: Arrow-batched pandas in,
  explicit GroupState, bounded timeout.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_within_watermark(
    stream: DataFrame, keys: list, time_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; state is evicted past it."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("nulls", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def running_stats_output_schema(key_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("key", key_type),
            T.StructField("n", T.LongType()),
            T.StructField("nulls", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("stddev", T.DoubleType()),
        ]
    )


def running_column_stats(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    timeout_ms: int = 0,
) -> DataFrame:
    """Per-key running (count, nulls, mean, stddev) across micro-batches.

    State per key is four numbers (Welford's online algorithm — exact mean
    and variance, O(1) memory, merge-free since each key's rows arrive in
    one group per batch).  Output mode must be ``update``.
    """
    import math  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    key_type = stream.schema[key_col].dataType
    out_schema = running_stats_output_schema(key_type)

    def _update(
        key: tuple, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        if state.exists:
            n, nulls, mean, m2 = state.get
        else:
            n, nulls, mean, m2 = 0, 0, 0.0, 0.0
        for pdf in pdfs:
            col = pdf[value_col]
            nulls += int(col.isna().sum())
            for v in col.dropna():
                n += 1
                delta = float(v) - mean
                mean += delta / n
                m2 += delta * (float(v) - mean)
        state.update((n, nulls, mean, m2))
        stddev = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "nulls": [nulls],
                "mean": [mean],
                "stddev": [stddev],
            }
        )

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
