"""Deterministic, engine-portable hashing.

``xxhash64``/``hash`` are Spark-private algorithms; results could never be
reproduced by another engine (or audited offline).  Everything that feeds a
*persisted* artifact — dedup signatures, fingerprints, LSH buckets — uses
md5-derived values instead: the hex digest is standard, and a 15-hex-digit
prefix fits a signed 64-bit int (60 bits) identically in any engine
(DuckDB: ``('0x' || substring(md5(x),1,15))::BIGINT``).

Spark-internal salting/shuffling still uses ``xxhash64`` (cheaper, and
nothing downstream persists it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint — portable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def stable_long_hash(col: Column, seed: int = 0) -> Column:
    """Seeded portable hash: md5 over the value with a seed suffix."""
    if seed:
        col = F.concat(col.cast("string"), F.lit(f"#{seed}"))
    return md5_long(col.cast("string"))
