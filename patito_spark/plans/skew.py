"""Explicit skew mitigation for joins over hot keys.

Counting aggregations don't need manual salting — Spark's partial
aggregation bounds reduce-side group sizes (see ``checks._duplicate_counts``).
Joins are different: a sort-merge join on a key where one value covers ~30%
of rows (hot URL domains, FIXTURES.md F1) sends that entire key range to
one reducer.  Two mechanisms, in preference order:

1. **AQE skew-join handling** (`spark.sql.adaptive.skewJoin.enabled`, on by
   default) splits oversized partitions at runtime — free, use it first.
2. **Explicit salting** (`salted_join`) for engines/paths AQE can't fix
   (e.g. when the skewed side feeds a downstream aggregation keyed the same
   way, or AQE is disabled): the fact side gets a random-ish salt in
   ``[0, S)`` derived from intra-row entropy, the dim side is replicated S
   times, and the join key becomes ``(key, salt)`` — the hot key spreads
   over S reducers.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

DEFAULT_SALT = 16


def _hashable(dt: DataType) -> bool:
    """Spark's hash expressions reject MapType anywhere in the type tree
    (map equality is undefined, so its hash is too)."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def with_salt(
    df: DataFrame,
    salt_buckets: int = DEFAULT_SALT,
    salt_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Attach a deterministic-per-row salt column ``_salt`` in [0, S).

    The salt is ``xxhash64`` over ROW CONTENT, so it depends only on the
    data — never on partitioning, row order, or task retries (a
    ``monotonically_increasing_id``-based salt is stable only while
    upstream row order is; a retried stage after a shuffle can re-deal
    it).  *salt_cols* names the columns hashed; the default is every
    hashable column.  At web scale prefer naming the join key plus a
    cheap high-entropy column (url, id) — the default otherwise feeds
    100-TB payload columns (html, text) through the hash to derive a
    4-bit salt.  Map-typed columns are excluded automatically (Spark's
    hash expressions reject MapType at analysis); naming one explicitly
    raises.  Residual: rows IDENTICAL across the salted columns land in
    the same bucket, so choose *salt_cols* that differ within the hot
    key — join correctness never depends on the salt value (the dim side
    is replicated across all buckets).
    """
    if salt_cols is None:
        fields = [f.name for f in df.schema.fields if _hashable(f.dataType)]
        if not fields:
            raise ValueError(
                "with_salt: no hashable columns (every column contains a "
                "map type) — pass salt_cols naming hashable columns"
            )
    else:
        fields = list(salt_cols)
        by_name = {f.name: f.dataType for f in df.schema.fields}
        bad = [c for c in fields if not _hashable(by_name[c])]
        if bad:
            raise ValueError(
                f"with_salt: salt_cols {bad} contain map types, which "
                "Spark's hash expressions reject — choose map-free columns"
            )
    return df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in fields]), F.lit(salt_buckets)
        ).cast("int"),
    )


def replicate_for_salt(dim: DataFrame, salt_buckets: int = DEFAULT_SALT) -> DataFrame:
    """Replicate the (small) dim side once per salt bucket."""
    return dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = DEFAULT_SALT,
    salt_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Join a skewed fact table to a dim on ``on`` with explicit salting.

    The dim is replicated ``salt_buckets``× (only viable when dim ≪ fact —
    exactly the hot-domain case); each hot fact key now hashes to
    ``salt_buckets`` distinct reducers.  *salt_cols* is forwarded to
    :func:`with_salt` (name the key + a cheap per-row column to keep
    payload bytes out of the salt hash).  Result columns match a plain
    join (the salt is dropped).
    """
    salted_fact = with_salt(fact, salt_buckets, salt_cols)
    salted_dim = replicate_for_salt(dim, salt_buckets)
    out = salted_fact.join(salted_dim, [on, "_salt"], how)
    return out.drop("_salt")


def skewness_report(df: DataFrame, key: Column, top_n: int = 10) -> DataFrame:
    """Per-key share of rows for the heaviest keys — decide whether to salt.

    One salted-by-construction aggregation (counting; partial agg absorbs
    the skew it is measuring).  The row total joins in as a broadcast
    one-row aggregate — no separate count() action, and the plan's top is
    a TakeOrderedAndProject (no global-sort exchange).
    """
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("rows") / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.col("rows").desc(), F.col("key").asc())
        .limit(top_n)
    )
