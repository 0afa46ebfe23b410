"""Continuous validation over Structured Streaming sources.

The reference is batch-only (SURVEY §2.f: no streaming); at web scale a
crawl is an unbounded stream, so the same model spec also compiles to a
streaming plan:

- ``flag_violations`` — per-row boolean flags + an error-name array, as a
  stateless projection (works on any stream, no watermark needed).  The
  per-row predicates are exactly the batch checks' row-level conditions.
- ``windowed_violation_counts`` — event-time windowed violation counts with
  a watermark for late data; emits the same (column, error_type, count)
  shape as the batch runner, one row per window.

Uniqueness/aggregate constraints are deliberately excluded here: exact
global uniqueness over an unbounded stream is unbounded state.  Use
``dropDuplicatesWithinWatermark`` upstream or the batch runner over closed
partitions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _row_check_predicates(model: type, df_columns: list) -> dict:
    """(column, check_name) → violation predicate Column (true = bad row)."""
    preds: dict[str, Column] = {}
    for name, spec in model.__column_specs__.items():
        if name not in df_columns:
            continue
        col = F.col(name)
        if not spec.nullable:
            preds[f"{name}__null"] = col.isNull()
        checks = []
        if spec.le is not None:
            checks.append(col <= F.lit(spec.le))
        if spec.lt is not None:
            checks.append(col < F.lit(spec.lt))
        if spec.ge is not None:
            checks.append(col >= F.lit(spec.ge))
        if spec.gt is not None:
            checks.append(col > F.lit(spec.gt))
        if spec.multiple_of is not None:
            checks.append((col == 0) | ((col % F.lit(spec.multiple_of)) == 0))
        if spec.const is not None:
            checks.append(col == F.lit(spec.const))
        if spec.pattern is not None:
            checks.append(col.rlike(spec.pattern))
        if spec.min_length is not None:
            checks.append(F.char_length(col) >= spec.min_length)
        if spec.max_length is not None:
            checks.append(F.char_length(col) <= spec.max_length)
        for i, check in enumerate(checks):
            # violation only when the check is definitively false (nulls
            # never fail bounds — same as batch)
            preds[f"{name}__bound{i}"] = ~F.coalesce(check, F.lit(True))
        if spec.allowed_values:
            preds[f"{name}__enum"] = col.isNotNull() & ~col.isin(
                *spec.allowed_values
            )
        if spec.constraints:
            pred = None
            for c in spec.constraints:
                if c.is_aggregate():
                    continue  # aggregate constraints are batch-only
                neg = ~c.substitute({"_": name}).to_column()
                pred = neg if pred is None else (pred | neg)
            if pred is not None:
                preds[f"{name}__constraint"] = F.coalesce(pred, F.lit(False))
    return preds


def flag_violations(df: DataFrame, model: type) -> DataFrame:
    """Append ``_valid`` (bool) and ``_violations`` (array of check names).

    Stateless — usable on both streams and batch frames; feeds a router
    (valid rows → main sink, invalid → quarantine) via ``foreachBatch`` or
    two filtered writeStreams.
    """
    preds = _row_check_predicates(model, df.columns)
    if not preds:
        return df.withColumn("_valid", F.lit(True)).withColumn(
            "_violations", F.array().cast(T.ArrayType(T.StringType()))
        )
    viol = F.array_compact(
        F.array(
            *[
                F.when(pred, F.lit(name))
                for name, pred in preds.items()
            ]
        )
    )
    return df.withColumn("_violations", viol).withColumn(
        "_valid", F.size("_violations") == 0
    )


def validate_stream(
    stream: DataFrame,
    model: type,
    quarantine_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
):
    """Split a stream into valid/invalid flows.

    Returns ``(valid_df, invalid_df)`` streaming frames; when
    ``quarantine_path`` is given, starts an append sink for the invalid
    side (caller starts their own sink for the valid side).
    """
    flagged = flag_violations(stream, model)
    valid = flagged.filter(F.col("_valid")).drop("_valid", "_violations")
    invalid = flagged.filter(~F.col("_valid"))
    if quarantine_path:
        query = (
            invalid.writeStream.format("parquet")
            .option("path", quarantine_path)
            .option(
                "checkpointLocation",
                checkpoint_dir or quarantine_path + "/_checkpoints",
            )
            .outputMode("append")
            .start()
        )
        return valid, invalid, query
    return valid, invalid


def windowed_violation_counts(
    stream: DataFrame,
    model: type,
    time_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed violation counts with late-data handling.

    One output row per (window, check) — the streaming analogue of the
    batch runner's per-partition violation rows.
    """
    preds = _row_check_predicates(model, stream.columns)
    aggs = [
        F.sum(pred.cast("long")).alias(name) for name, pred in preds.items()
    ] or [F.count(F.lit(1)).alias("rows")]
    windowed = (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"))
        .agg(F.count(F.lit(1)).alias("rows"), *aggs)
    )
    return windowed
