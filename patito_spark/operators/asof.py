"""As-of (nearest-timestamp) joins — an operator Spark lacks natively.

Composition, not UDF: both sides union into one keyed stream, a single
ordered window carries the most recent right-side payload forward (or the
next one backward for ``direction="forward"``), and left rows project it
out.  Cost: ONE shuffle on the ``by`` key + a per-group sort — the same
shape as any windowed aggregation, spillable, no broadcast or range-join
explosion.  With no ``by`` key the window is global (single partition);
always pass ``by`` at scale.

Semantics match the conventional as-of join (polars ``join_asof``, DuckDB
``ASOF JOIN``): for each left row, the right row with the greatest
``on <= left.on`` (backward, default) or smallest ``on >= left.on``
(forward), per ``by`` group; unmatched left rows keep NULL right columns.
NULL ``on`` values never match (same as both reference engines): right
rows with NULL ``on`` are dropped before the union, and left rows with
NULL ``on`` pass through with NULL right columns.
Ties among equal right timestamps resolve to the last row in the sort
order — keep right side unique per (by, on) for deterministic output.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[Sequence[str]] = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + the nearest right row's columns.

    ``on`` must exist on both sides (orderable: timestamp/numeric); ``by``
    columns must exist on both sides and equality-match.  Right columns
    that collide with left names get *suffix*.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by) if by else []
    lcols = list(left.columns)
    rcols = [c for c in right.columns if c not in by and c != on]
    l_struct_type = T.StructType([left.schema[c] for c in lcols])
    r_struct_type = T.StructType([right.schema[c] for c in rcols])

    l = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    # NULL `on` never matches (DuckDB ASOF / polars join_asof parity): a
    # NULL right timestamp would sort NULLS-FIRST before every real row and
    # its payload would be carried forward to ALL left rows — drop them here
    r = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_struct_type).alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    u = l.unionByName(r)

    if by:
        part = Window.partitionBy(*by)
    else:
        import warnings  # noqa: PLC0415

        warnings.warn(
            "asof_join without by= plans a single-partition global window — "
            "both inputs sort on one task. Pass by= (the equality keys) at "
            "scale.",
            stacklevel=2,
        )
        part = Window.partitionBy(F.lit(1))
    if direction == "backward":
        # right rows sort BEFORE a left row with the same timestamp, so
        # `on <= left.on` is inclusive; last non-null right payload wins
        w = part.orderBy(F.col("_ts").asc(), F.col("_is_left").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        picked = F.last("_r", ignorenulls=True).over(w)
    else:
        # forward: right rows sort AFTER the left row at equal timestamps
        # (still inclusive: the frame starts at the current row)
        w = part.orderBy(F.col("_ts").asc(), F.col("_is_left").desc()).rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        picked = F.first("_r", ignorenulls=True).over(w)

    # NULL-ts left rows stay in the stream (one scan) but never match: in
    # backward mode their NULLS-FIRST frame holds no right payload anyway;
    # the guard also covers forward mode, where the frame would otherwise
    # reach every following right row
    matched = u.withColumn(
        "_m", F.when(F.col("_ts").isNotNull(), picked)
    ).filter(F.col("_is_left") == 1)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in lcols]
    out_cols += [
        F.col(f"_m.{c}").alias(c if c not in lcols else f"{c}{suffix}")
        for c in rcols
    ]
    return matched.select(*out_cols)
