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
folds them into a single ``compacted-<id>`` base per store while the
stream is stopped (it refuses to run against a live stream — the
``_active_query`` marker + ``spark.streams.active`` check).  The NEWEST
batch directory is never folded: Structured Streaming commits offsets in
order, so every batch id strictly below the maximum is known-committed,
but the maximum itself may be an uncommitted attempt the restarted
stream will replay — folding it would make the replay read nothing
(``k < n`` excludes ``compacted-n``) and double-count the batch.

The directory protocol speaks the Hadoop ``FileSystem`` API throughout,
so ``store_root`` may be a bare local path or any ``file:/`` / ``hdfs://``
/ ``s3a://`` URI the cluster's Hadoop configuration can open; on a real
deployment the same layout maps onto a table format's transactional
append + compaction.  Re-crawl replacement (``replace_in_store``) is
deliberately NOT wired into the hot streaming path — rewriting
corpus-sized state per micro-batch is the wrong tier; run it in the
batch/backfill tier, the same lambda split as ``streaming/dedup.py``.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "compact_stores",
    "crawl_ingest_stream",
    "read_ingested_corpus",
    "read_quarantine",
    "read_quarantine_specs",
]

_FINGERPRINTS = "fingerprints"
_SIGNATURES = "signatures"
_SURVIVORS = "survivors"
_QUARANTINE = "quarantine"
_SPECS = _QUARANTINE + "/_specs"
_ACTIVE_MARKER = "_active_query"


# ---------------------------------------------------------------------------
# Hadoop FileSystem protocol (local paths and file:/hdfs:/s3a: URIs alike)
# ---------------------------------------------------------------------------


def _hfs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for *path_str* under the session's Hadoop conf."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, path


def _join(dir_str: str, *names: str) -> str:
    return "/".join([dir_str.rstrip("/"), *names])


def _child_names(spark: SparkSession, dir_str: str) -> list:
    fs, path = _hfs(spark, dir_str)
    if not fs.exists(path):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(path))


def _write_text(spark: SparkSession, path_str: str, payload: str) -> None:
    fs, path = _hfs(spark, path_str)
    out = fs.create(path, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path_str: str) -> Optional[str]:
    fs, path = _hfs(spark, path_str)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _batch_dirs(
    spark: SparkSession, store_dir: str, upto_batch_id: Optional[int] = None
) -> list:
    """``batch-<k>`` (k < upto) and ``compacted-<m>`` (m < upto) subdirs,
    oldest first.  ``upto_batch_id=None`` lists everything.

    Only the HIGHEST ``compacted-`` base counts, and a ``batch-<k>``
    with ``k <= max compacted id`` is EXCLUDED: compaction folds every
    older base and every committed batch dir into the new base and
    renames it live BEFORE deleting the folded dirs, so any such dir is
    a leftover from a crash between those two steps whose rows the base
    already contains — counting it would double them.  ``compact_stores``
    deletes leftovers on its next run."""
    tagged = []
    for name in _child_names(spark, store_dir):
        for prefix in ("batch-", "compacted-"):
            if name.startswith(prefix):
                try:
                    k = int(name[len(prefix):])
                except ValueError:
                    continue
                tagged.append((prefix, k, name))
    max_compacted = max(
        (k for prefix, k, _ in tagged if prefix == "compacted-"), default=-1
    )
    return [
        _join(store_dir, name)
        for prefix, k, name in tagged
        if not (prefix == "batch-" and k <= max_compacted)
        and not (prefix == "compacted-" and k < max_compacted)
        and (upto_batch_id is None or k < upto_batch_id)
    ]


def _read_store(
    spark: SparkSession, store_dir: str, upto_batch_id: Optional[int]
) -> Optional[DataFrame]:
    dirs = [
        d
        for d in _batch_dirs(spark, store_dir, upto_batch_id)
        # a replay attempt may have left an empty/partial dir; parquet
        # read of a dir with no part files fails, so require one
        if any(f.endswith(".parquet") for f in _child_names(spark, d))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


# ---------------------------------------------------------------------------
# The per-micro-batch increment
# ---------------------------------------------------------------------------


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
            # violation rows keep their _violations check names PLUS the
            # spec hash that flagged them — lineage that survives
            # compaction because it rides IN the rows, with the full
            # spec JSON content-addressed under quarantine/_specs/ (the
            # same write replayed is a byte-identical overwrite)
            from .validate import flag_violations

            spec_payload = model.spec_json()
            spec_hash = hashlib.md5(spec_payload.encode()).hexdigest()
            spec_file = _join(store_root, _SPECS, f"{spec_hash}.json")
            if _read_text(spark, spec_file) is None:
                _write_text(spark, spec_file, spec_payload)

            flagged = flag_violations(batch_df, model)
            flagged.filter(~F.col("_valid")).drop("_valid").withColumn(
                "_spec_hash", F.lit(spec_hash)
            ).write.mode("overwrite").parquet(
                _join(store_root, _QUARANTINE, f"batch-{batch_id}")
            )
            batch_df = flagged.filter(F.col("_valid")).drop(
                "_valid", "_violations"
            )
        fp_store = _read_store(
            spark, _join(store_root, _FINGERPRINTS), batch_id
        )
        sig_store = _read_store(
            spark, _join(store_root, _SIGNATURES), batch_id
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
                _join(store_root, sub, f"batch-{batch_id}")
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
    ``_violations`` column naming the failed checks and a ``_spec_hash``
    column naming the model spec version that flagged them
    (:func:`read_quarantine` reads them back,
    :func:`read_quarantine_specs` resolves the hashes), and never touch
    the dedup stores.

    A ``_active_query`` marker carrying the query's persistent id is
    written under *store_root* so :func:`compact_stores` can refuse to
    race a live stream.
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
    query = (
        stream_df.writeStream.foreachBatch(processor)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    # query.id is the checkpoint-persistent id (stable across restarts);
    # overwriting on every start keeps the marker current
    _write_text(
        stream_df.sparkSession,
        _join(store_root, _ACTIVE_MARKER),
        str(query.id),
    )
    return query


def read_ingested_corpus(spark: SparkSession, store_root: str) -> DataFrame:
    """Every survivor the stream has committed so far."""
    dirs = _batch_dirs(spark, _join(store_root, _SURVIVORS))
    if not dirs:
        raise ValueError(f"no ingested batches under {store_root!r}")
    return spark.read.parquet(*dirs)


def read_quarantine(spark: SparkSession, store_root: str) -> DataFrame:
    """Every quarantined (model-violating) row the stream has committed,
    with the ``_violations`` check names and the ``_spec_hash`` of the
    model spec that flagged the row (``mergeSchema`` bridges pre-lineage
    batch dirs, whose rows read as ``_spec_hash = NULL``)."""
    dirs = _batch_dirs(spark, _join(store_root, _QUARANTINE))
    if not dirs:
        raise ValueError(f"no quarantined batches under {store_root!r}")
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def read_quarantine_specs(spark: SparkSession, store_root: str) -> dict:
    """``{spec_hash: spec_json}`` for every model spec version that ever
    quarantined a row under *store_root* — feed the JSON to
    ``patito_spark.spec.model_from_spec_json`` (or ``evolution.py``'s
    ``diff_models``) to attribute violations across model evolution."""
    specs_dir = _join(store_root, _SPECS)
    out = {}
    for name in _child_names(spark, specs_dir):
        if name.endswith(".json"):
            out[name[: -len(".json")]] = _read_text(
                spark, _join(specs_dir, name)
            )
    return out


def compact_stores(spark: SparkSession, store_root: str) -> dict:
    """Fold per-batch store directories into one ``compacted-<id>`` base
    per store.  Refuses to run while the ingest stream is active, and
    never folds the newest batch (see module docstring: the maximum
    batch id may be an uncommitted attempt whose replay must still see
    the pre-batch store state).  Returns ``{store: n_dirs_folded}``."""
    marker = _read_text(spark, _join(store_root, _ACTIVE_MARKER))
    if marker is not None and marker in {
        str(q.id) for q in spark.streams.active
    }:
        raise RuntimeError(
            f"compact_stores: ingest query {marker} over {store_root!r} is "
            "still active — stop the stream first (compacting mid-stream "
            "races the k < batch_id read rule)"
        )
    # the newest batch id ANYWHERE under the root is the one id that may
    # not be offset-committed yet; every id strictly below it is
    # committed (Structured Streaming commits batches in order)
    newest = -1
    for sub in (_FINGERPRINTS, _SIGNATURES, _SURVIVORS, _QUARANTINE):
        for d in _batch_dirs(spark, _join(store_root, sub)):
            name = d.rsplit("/", 1)[1]
            if name.startswith("batch-"):
                newest = max(newest, int(name.split("-", 1)[1]))
    folded = {}
    for sub in (_FINGERPRINTS, _SIGNATURES, _SURVIVORS, _QUARANTINE):
        store_dir = _join(store_root, sub)
        fs_pre, _ = _hfs(spark, store_dir)
        PathCls = spark._jvm.org.apache.hadoop.fs.Path
        live = {d.rsplit("/", 1)[1] for d in _batch_dirs(spark, store_dir)}
        for name in _child_names(spark, store_dir):
            # leftovers of a crashed previous compaction: batch dirs the
            # read rule already ignores (id <= max compacted id) and
            # orphaned _compacting tmp dirs
            prefix = next(
                (
                    p
                    for p in ("batch-", "compacted-", "_compacting-")
                    if name.startswith(p)
                ),
                None,
            )
            if prefix is None or name in live:
                continue
            try:
                int(name[len(prefix):])
            except ValueError:
                continue
            fs_pre.delete(PathCls(_join(store_dir, name)), True)
        dirs = [
            d
            for d in _batch_dirs(spark, store_dir)
            if d.rsplit("/", 1)[1] != f"batch-{newest}"
        ]
        if len(dirs) < 2:
            folded[sub] = 0
            continue
        max_id = max(int(d.rsplit("-", 1)[1]) for d in dirs)
        reader = spark.read
        if sub == _QUARANTINE:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*dirs)
        fs, _ = _hfs(spark, store_dir)
        Path = spark._jvm.org.apache.hadoop.fs.Path
        tmp = _join(store_dir, f"_compacting-{max_id}")
        final = _join(store_dir, f"compacted-{max_id}")
        df.write.mode("overwrite").parquet(tmp)
        # rename FIRST (Hadoop rename returns False instead of raising —
        # check it), delete the folded dirs only once the base is live:
        # a crash between the two leaves duplicate rows, which the next
        # compaction folds away, never a data hole.  The '_'-prefixed tmp
        # dir is invisible to readers, and compacted-<max_id> cannot
        # pre-exist (its ids were still batch dirs until now).
        if not fs.rename(Path(tmp), Path(final)):
            raise IOError(
                f"compact_stores: rename {tmp} -> {final} failed; "
                "folded directories left untouched"
            )
        for d in dirs:
            fs.delete(Path(d), True)
        folded[sub] = len(dirs)
    return folded
