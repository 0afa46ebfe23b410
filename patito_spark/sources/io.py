"""Model-aware sources and sinks.

≈ reference ``DataFrame.read_csv`` (``src/patito/polars.py:879-960``): the
model supplies the schema (so the scan never infers) and derived columns are
populated on read.  Beyond the reference: parquet/table scans with
column-pruned projections (only spec columns are selected, so Catalyst
pushes the pruning into the file scan) and a violation-report sink.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    model: type,
    header: bool = True,
    derive: bool = True,
    **options,
):
    """CSV scan with the model's schema injected (never inferred).

    Headerless files take the model's column order (reference
    ``polars.py:944-945``); ``derive=True`` populates derived columns
    (reference calls ``.derive()`` on the result, ``polars.py:960``).
    """
    # columns derived from expressions are computed, not read
    read_cols = [
        name
        for name, spec in model.__column_specs__.items()
        if spec.derived_from is None
    ]
    from pyspark.sql import types as T

    fields = [
        T.StructField(n, model.__column_specs__[n].dtype, True) for n in read_cols
    ]
    df = spark.read.csv(
        path, schema=T.StructType(fields), header=header, **options
    )
    if not header:
        df = df.toDF(*read_cols)
    if model.model_config.get("alias_generator"):
        # headers written under alias names map back to field names
        # (reference remaps override keys, polars.py:946-957)
        from ..plans.checks import _transform_df

        df = _transform_df(df, model)
    wrapped = model.DataFrame(df)
    if derive and model.derived_columns:
        wrapped = wrapped.derive()
    return wrapped


def read_parquet(
    spark: SparkSession,
    path: str,
    model: Optional[type] = None,
    validate: bool = False,
    prune: bool = True,
):
    """Parquet scan; with a model, project only spec columns (column
    pruning reaches the file scan) and optionally validate."""
    df = spark.read.parquet(path)
    if model is None:
        return df
    if prune:
        keep = [c for c in model.columns if c in df.columns]
        df = df.select(*keep)
    if validate:
        return model.validate(df)
    return model.DataFrame(df)


def read_table(
    spark: SparkSession,
    name: str,
    model: Optional[type] = None,
    validate: bool = False,
):
    """Catalog table scan (Iceberg/Hive/temp view) with optional model."""
    df = spark.table(name)
    if model is None:
        return df
    if validate:
        return model.validate(df)
    return model.DataFrame(df)


def scan_for(spark: SparkSession, model: type, path: str, fmt: str = "parquet"):
    """Schema-first scan: the model's StructType is imposed on the source."""
    return model.DataFrame(
        spark.read.format(fmt).schema(model.spark_schema()).load(path)
    )


def write_report(df: DataFrame, path: str, partition_by: Optional[list] = None) -> None:
    """Append a violation/metrics report (parquet; Iceberg-compatible layout
    — swap for ``writeTo(...).append()`` under a real catalog)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
