"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the north-rule table already carries one (``html binary``).  The Spark-side
plumbing (schemas, Arrow batch shapes, partition-aware ``mapInPandas``
stages) is real and tested; the codec step is STUBBED: this container has
no image/audio libraries, so decode either uses an import-gated real
library (PIL/soundfile if present) or raises ``NotImplementedError`` —
except for the deterministic byte-level features, which are genuinely
computable (and useful: byte histograms catch corrupt/truncated payloads at
ingest).

Batch-shape contract for every stage here: input Arrow batches of
``(id, payload binary, ...)``; output one row per input row (feature
stages) or N rows per input (frame sampling); numpy-vectorized inside the
batch, never per-row Python loops over pixels.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str, mime: Optional[str] = None
) -> DataFrame:
    """Cheap metadata struct from the payload itself (no decode)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            (F.lit(mime) if mime else F.lit(None).cast("string")).alias("mime"),
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def byte_histogram(
    df: DataFrame, id_col: str, payload_col: str, buckets: int = 16
) -> DataFrame:
    """Per-payload byte-value histogram — a REAL feature (no codec needed):
    catches truncated/corrupt/mis-encoded payloads before expensive decode.

    Arrow-batched ``mapInPandas``; numpy ``bincount`` per payload.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("hist", T.ArrayType(T.LongType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    div = 256 // buckets

    def _hist(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, hists, sizes = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                counts = np.bincount(arr // div, minlength=buckets)[:buckets]
                ids.append(i)
                hists.append(counts.tolist())
                sizes.append(len(arr))
            yield pd.DataFrame({"id": ids, "hist": hists, "n_bytes": sizes})

    return df.select(id_col, payload_col).mapInPandas(_hist, out_schema)


def decode_image(
    df: DataFrame, id_col: str, payload_col: str, resize: Optional[tuple] = None
) -> DataFrame:
    """Decode image payloads → (id, width, height, mean_pixel).

    Import-gated on PIL; raises ``NotImplementedError`` when no codec is
    available (this sandbox).  The mapInPandas plumbing below is the real
    production shape — swap the inner loop's decoder only.
    """
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - no PIL in this container
        raise NotImplementedError(
            "decode_image requires Pillow, which is not available in this "
            "environment. The Spark plumbing (schema, batching, partitioning) "
            "is exercised via byte_histogram/fake_image_features instead."
        ) from exc

    import io  # noqa: PLC0415
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_pixel", T.DoubleType()),
        ]
    )

    def _decode(batches: Iterator) -> Iterator:  # pragma: no cover
        for pdf in batches:
            rows = {"id": [], "width": [], "height": [], "mean_pixel": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = Image.open(io.BytesIO(payload))
                if resize:
                    img = img.resize(resize)
                arr = np.asarray(img, dtype="float64")
                rows["id"].append(i)
                rows["width"].append(img.width)
                rows["height"].append(img.height)
                rows["mean_pixel"].append(float(arr.mean()))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


def fake_image_features(
    df: DataFrame, id_col: str, payload_col: str, dim: int = 8
) -> DataFrame:
    """Deterministic stand-in for an image-embedding stage: features are a
    seeded function of the payload bytes (md5-chunked), so tests exercise
    the exact batching/schema/shuffle path a real encoder would use."""
    import hashlib  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def _feat(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, feats = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(payload or b"").digest()
                feats.append(
                    [(digest[j % 16] - 128) / 128.0 for j in range(dim)]
                )
                ids.append(i)
            yield pd.DataFrame({"id": ids, "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(_feat, out_schema)


def frame_sample(
    df: DataFrame, id_col: str, payload_col: str, n_frames: int = 4
) -> DataFrame:
    """'Video' frame sampling stub: splits the payload into ``n_frames``
    equal byte slices (1 input row → N output rows — the real fan-out shape
    of a frame sampler), each tagged with its frame index."""
    idx = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_frames - 1)),
            lambda i: F.substring(
                F.col(payload_col),
                (i * (F.octet_length(payload_col) / n_frames)).cast("int") + 1,
                (F.octet_length(payload_col) / n_frames).cast("int"),
            ),
        )
    )
    return df.select(F.col(id_col), idx.alias("frame_idx", "frame_bytes"))
