"""Deterministic, key-based sampling and dataset splits.

``rand()``-based sampling is neither reproducible across runs/engines nor
stable under retries/resumes; at training-data scale the standard practice
is hash-based assignment: a row's fate is a pure function of its key.
md5 keeps the hash portable (identical in every engine — see
``functions.hashing``), so samples and splits are oracle-checkable and a
re-run on a grown table keeps previously-assigned rows in the same split.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: assignment granularity: the md5-derived value is uniform in [0, 10^6)
_BUCKETS = 1_000_000


def _hash_fraction(key: Column, salt: str) -> Column:
    """Uniform [0, 1) fraction from a key — portable md5, first 15 hex
    chars (fits a signed bigint in every engine)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h % _BUCKETS) / F.lit(float(_BUCKETS))


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen purely by key hash.

    Same key → same verdict on every run, engine, and table size; the
    filter is a scan-side predicate (no shuffle)."""
    return df.filter(_hash_fraction(F.col(key_col), salt) < rate)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) by key hash.

    *weights* maps label → relative weight (normalized internally); labels
    are assigned in sorted-label order over contiguous hash ranges, so the
    assignment is stable when weights stay put and reproducible anywhere.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {label: weight} dict")
    total = float(sum(weights.values()))
    frac = _hash_fraction(F.col(key_col), salt)
    expr = None
    cumulative = 0.0
    labels = sorted(weights)
    for label in labels[:-1]:
        cumulative += weights[label] / total
        clause = frac < cumulative
        expr = (
            F.when(clause, F.lit(label))
            if expr is None
            else expr.when(clause, F.lit(label))
        )
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def split_counts(
    df: DataFrame, key_col: str, weights: dict, salt: str = "split"
) -> DataFrame:
    """Rows per split label — the sanity report for a split assignment."""
    return (
        hash_split(df, key_col, weights, salt=salt)
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Keep a per-stratum fraction of rows, chosen purely by key hash.

    The training-data balancing primitive: ``fractions`` maps a stratum
    value (e.g. a language) to its keep rate; strata not listed keep
    ``default`` (0.0 = drop — an explicit allowlist).  Like
    ``deterministic_sample`` this is a scan-side predicate — no shuffle,
    reproducible across runs/engines/table growth, and a row's fate never
    depends on the rest of its stratum (so it composes with resume and
    with distributed execution trivially, unlike exact-count quota
    sampling which needs a global sort or sketch).

    The key is salted with the STRATUM as well: the same document id kept
    under one stratum does not bias its fate under another (strata use
    independent hash streams).
    """
    if not fractions:
        raise ValueError("fractions must be a non-empty {stratum: rate} dict")
    for stratum, rate in fractions.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1]")
    rate_expr = None
    for stratum in sorted(fractions):
        clause = F.col(strata_col) == stratum
        lit = F.lit(float(fractions[stratum]))
        rate_expr = (
            F.when(clause, lit) if rate_expr is None else rate_expr.when(clause, lit)
        )
    rate_expr = rate_expr.otherwise(F.lit(float(default)))
    frac = _hash_fraction(
        F.concat(F.col(key_col).cast("string"), F.lit("|"), F.col(strata_col).cast("string")),
        salt,
    )
    return df.filter(frac < rate_expr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_by: Optional[list] = None,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Keep at most *k* rows per group — hot-domain crawl budgeting.

    Rate-based sampling (:func:`stratified_sample`) cannot bound a hot
    group absolutely: 0.1% of a boilerplate domain with 10^9 pages is
    still 10^6 pages.  This operator enforces a hard per-group cap,
    keeping the TOP rows by *order_by* (e.g. a quality score descending)
    with *id_col* as the deterministic tiebreaker.

    One ``hashpartitioning(group)`` exchange + local sort per group — no
    global sort.  Groups larger than executor spill budgets are fine (the
    window sort spills); rank state is one counter per group.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql.window import Window  # noqa: PLC0415

    order = list(order_by or [])
    if id_col is not None:
        order.append(F.col(id_col).asc())
    if not order:
        raise ValueError("pass order_by= and/or id_col= (deterministic order)")
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_pt_rk", F.row_number().over(w))
        .filter(F.col("_pt_rk") <= k)
        .drop("_pt_rk")
    )
