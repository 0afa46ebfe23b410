"""Vector math over ``array<float/double>`` embedding columns.

Native higher-order functions (``zip_with`` + ``aggregate``) — evaluated
inside whole-stage codegen on the JVM, no Python round-trip.  For very wide
fan-outs (brute-force top-k over millions of candidates) the
``operators.similarity`` module offers a numpy ``mapInPandas`` variant that
amortizes per-row overhead into Arrow-batched matrix products.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))
