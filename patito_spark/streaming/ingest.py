"""Continuous crawl ingestion: the streaming front-end of
:func:`~patito_spark.operators.pipeline.prepare_training_increment`.

The batch increment pipeline already has the production shape for a daily
crawl (filters → exact dedup vs a fingerprint store → near-dup vs an LSH
signature store, every store access batch-cost, never corpus-shuffling).
This module drives exactly that pipeline from Structured Streaming via
``foreachBatch``: each micro-batch IS one increment, and the dedup stores
advance with the stream.

Exactly-once store advance under batch replay
---------------------------------------------
``foreachBatch`` may re-invoke the processor for a batch id after a
failure, so a naive ``mode("append")`` store write would double-count the
replayed batch's deltas.  Instead every output of batch *n* lands in its
own ``batch-<n>`` directory with ``mode("overwrite")`` — a replay
overwrites its previous (possibly partial) attempt instead of appending
to it — and the store snapshot a batch READS is restricted to directories
``batch-<k>, k < n`` (plus compacted bases), so a replayed batch sees the
exact store state its first attempt saw even if its own delta directory
already exists.  Idempotence is pinned by calling the processor twice
with the same batch id in the tests.

Store lifecycle at scale
------------------------
Per-batch directories accumulate small files; :func:`compact_stores`
folds them into a single ``compacted-<maxid>`` base (and removes the
folded directories) while the stream is stopped.  On a real cluster the
same layout maps onto a table format's transactional append + compaction;
the directory protocol here keeps the engine dependency-free.  Re-crawl
replacement (``replace_in_store``) is deliberately NOT wired into the
hot streaming path — rewriting corpus-sized state per micro-batch is the
wrong tier; run it in the batch/backfill tier, the same lambda split as
``streaming/dedup.py``.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "compact_stores",
    "crawl_ingest_stream",
    "read_ingested_corpus",
    "read_quarantine",
]

_FINGERPRINTS = "fingerprints"
_SIGNATURES = "signatures"
_SURVIVORS = "survivors"
_QUARANTINE = "quarantine"


def _batch_dirs(store_dir: str, upto_batch_id: Optional[int] = None) -> list:
    """``batch-<k>`` (k < upto) and ``compacted-<m>`` (m < upto) subdirs,
    oldest first.  ``upto_batch_id=None`` lists everything."""
    if not os.path.isdir(store_dir):
        return []
    out = []
    for name in sorted(os.listdir(store_dir)):
        for prefix in ("batch-", "compacted-"):
            if name.startswith(prefix):
                try:
                    k = int(name[len(prefix):])
                except ValueError:
                    continue
                if upto_batch_id is None or k < upto_batch_id:
                    out.append(os.path.join(store_dir, name))
    return out


def _read_store(
    spark: SparkSession, store_dir: str, upto_batch_id: Optional[int]
) -> Optional[DataFrame]:
    dirs = [
        d
        for d in _batch_dirs(store_dir, upto_batch_id)
        # a replay attempt may have left an empty/partial dir; parquet
        # read of a dir with no part files fails, so require one
        if any(f.endswith(".parquet") for f in os.listdir(d))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def _make_batch_processor(
    store_root: str,
    id_col: str,
    text_col: str,
    increment_kwargs: dict,
    model: Optional[type] = None,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body, factored out so tests can drive it
    directly (including replaying a batch id to pin idempotence)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from pyspark.sql import functions as F

        from ..operators.pipeline import prepare_training_increment

        if model is not None:
            # schema/constraint gate FIRST (the north-rule order: a
            # malformed page must never reach the dedup stores); the
            # quarantine rides the same replay-safe batch-dir protocol,
            # violation rows keep their _violations check names
            from .validate import flag_violations

            flagged = flag_violations(batch_df, model)
            flagged.filter(~F.col("_valid")).drop("_valid").write.mode(
                "overwrite"
            ).parquet(os.path.join(store_root, _QUARANTINE, f"batch-{batch_id}"))
            batch_df = flagged.filter(F.col("_valid")).drop(
                "_valid", "_violations"
            )
        fp_store = _read_store(
            spark, os.path.join(store_root, _FINGERPRINTS), batch_id
        )
        sig_store = _read_store(
            spark, os.path.join(store_root, _SIGNATURES), batch_id
        )
        survivors, fp_delta, sig_delta = prepare_training_increment(
            batch_df,
            id_col,
            text_col,
            fingerprint_store=fp_store,
            signature_store=sig_store,
            **increment_kwargs,
        )
        for sub, df in (
            (_SURVIVORS, survivors),
            (_FINGERPRINTS, fp_delta),
            (_SIGNATURES, sig_delta),
        ):
            df.write.mode("overwrite").parquet(
                os.path.join(store_root, sub, f"batch-{batch_id}")
            )

    return _process


def crawl_ingest_stream(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    store_root: str,
    checkpoint_dir: str,
    lang_col: Optional[str] = None,
    allowed_langs: Optional[Sequence[str]] = None,
    min_chars: Optional[int] = None,
    min_quality: Optional[float] = None,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 64,
    model: Optional[type] = None,
):
    """Start the ingest query: each micro-batch is (optionally) validated
    against *model* with violation rows quarantined, then filtered and
    deduped exactly and near-exactly against the accumulated corpus state
    under *store_root*, and its survivors + store deltas are committed
    replay-safely (see module docstring).  Returns the
    ``StreamingQuery``; the source offsets live in *checkpoint_dir*, so a
    restarted stream resumes at the first unprocessed batch with the
    stores exactly where the crash left them.

    *model* — a ``patito_spark.Model``; rows failing its row-level checks
    land under ``<store_root>/quarantine/batch-<n>`` with a
    ``_violations`` column naming the failed checks
    (:func:`read_quarantine` reads them back), and never touch the dedup
    stores.
    """
    processor = _make_batch_processor(
        store_root,
        id_col,
        text_col,
        model=model,
        increment_kwargs=dict(
            lang_col=lang_col,
            allowed_langs=allowed_langs,
            min_chars=min_chars,
            min_quality=min_quality,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            max_bucket_size=max_bucket_size,
        ),
    )
    return (
        stream_df.writeStream.foreachBatch(processor)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_ingested_corpus(spark: SparkSession, store_root: str) -> DataFrame:
    """Every survivor the stream has committed so far."""
    dirs = _batch_dirs(os.path.join(store_root, _SURVIVORS))
    if not dirs:
        raise ValueError(f"no ingested batches under {store_root!r}")
    return spark.read.parquet(*dirs)


def read_quarantine(spark: SparkSession, store_root: str) -> DataFrame:
    """Every quarantined (model-violating) row the stream has committed,
    with the ``_violations`` check names."""
    dirs = _batch_dirs(os.path.join(store_root, _QUARANTINE))
    if not dirs:
        raise ValueError(f"no quarantined batches under {store_root!r}")
    return spark.read.parquet(*dirs)


def compact_stores(spark: SparkSession, store_root: str) -> dict:
    """Fold per-batch store directories into one ``compacted-<maxid>``
    base per store (run while the stream is STOPPED).  The next batch id
    the restarted stream assigns is strictly greater than every folded
    id, so the ``k < batch_id`` read rule keeps seeing the compacted base.
    Returns ``{store: n_dirs_folded}``."""
    folded = {}
    for sub in (_FINGERPRINTS, _SIGNATURES, _SURVIVORS, _QUARANTINE):
        store_dir = os.path.join(store_root, sub)
        dirs = _batch_dirs(store_dir)
        if len(dirs) < 2:
            folded[sub] = 0
            continue
        max_id = max(int(os.path.basename(d).split("-", 1)[1]) for d in dirs)
        df = spark.read.parquet(*dirs)
        tmp = os.path.join(store_dir, f"_compacting-{max_id}")
        df.write.mode("overwrite").parquet(tmp)
        for d in dirs:
            shutil.rmtree(d)
        os.rename(tmp, os.path.join(store_dir, f"compacted-{max_id}"))
        folded[sub] = len(dirs)
    return folded
