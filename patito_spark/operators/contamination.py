"""Train/eval n-gram contamination (benchmark decontamination).

A core training-data-pipeline check the reference has no analogue for:
before training, every evaluation document is scored by how many of its
distinct word n-grams also occur anywhere in the training corpus — the
standard n-gram-overlap decontamination signal.  High-fraction eval docs
are leaked into the training set and must be dropped (from train or from
the benchmark) before any honest evaluation.

Scale design (100 TB train corpus, benchmark-sized eval set):

- Whichever side is small has its n-gram set BROADCAST, so the big side
  is scanned once and never shuffled by n-gram — both directions: a tiny
  benchmark scored against a huge train corpus (broadcast the benchmark's
  n-grams), AND a huge train corpus scored against a tiny benchmark for
  decontamination (broadcast the benchmark's n-grams and mark the train
  side in one pass, no intersection stage at all).
- All joins carry 16-hex md5 prefixes, never shingle text.
- When NEITHER side is small (corpus-vs-corpus overlap), the same
  plan-size estimate used by ``plans.uniqueness.referential_violations``
  falls back to shuffle hash joins that AQE re-plans from exact shuffle
  statistics.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles_from_tokens
from ..plans.uniqueness import BROADCAST_SIZE_THRESHOLD, _estimated_bytes
from .dedup import _materialize

#: What actually broadcasts is the DISTINCT n-gram md5-prefix set, not the
#: text, and the plan-size estimate sees the (parquet-compressed) TEXT
#: column — so the broadcast decision must derate the threshold by this
#: expansion factor, else an eval set estimating just under the limit
#: forces a multi-GB broadcast and OOMs executors at the documented scale.
#: MEASURED (2026-08-17, fixtures sf0.01 + sf0.1, SizeEstimator over the
#: collected distinct-set UnsafeRows — 92 bytes per 16-hex row in memory):
#: n=8 → 95.5x (sf0.01) / 104.3x (sf0.1) the text plan estimate; n=3
#: saturates the shingle space and measures lower (68.7x / 12.6x).  The
#: binding direction is the large-n non-saturating one, so the derate is
#: set to 104 — the worst measured ratio (the hashed-relation build adds
#: pointer overhead but drops per-row object headers, so the collected-row
#: measurement is the right order).  Net gate: eval text estimating
#: ≤ ~2.5 MB (≈ benchmark-sized) broadcasts; corpus-scale sides shuffle.
NGRAM_BROADCAST_EXPANSION = 104


def _ngram_broadcast_ok(df: DataFrame, text_col: str) -> bool:
    """True when *df*'s distinct n-gram set is safely broadcastable: its
    TEXT plan estimate must clear the broadcast threshold derated by the
    measured text→n-gram-relation expansion (see
    ``NGRAM_BROADCAST_EXPANSION``)."""
    return (
        _estimated_bytes(df.select(text_col))
        <= BROADCAST_SIZE_THRESHOLD // NGRAM_BROADCAST_EXPANSION
    )


def _doc_ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc id, distinct shingle md5-prefix) pairs; 0-shingle docs keep one
    NULL row so they survive to the per-doc aggregate."""
    staged = _materialize(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")),
        _toks=tokens(F.col("_text")),
    )
    staged = _materialize(
        staged, _sh=word_shingles_from_tokens(F.col("_toks"), n)
    )
    return staged.select(
        "_id",
        F.explode_outer(
            F.array_distinct(
                F.transform(
                    F.col("_sh"),
                    lambda s: F.substring(F.md5(s), 1, 16),
                )
            )
        ).alias("_h"),
    )


def ngram_contamination(
    eval_df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    broadcast_eval: Optional[bool] = None,
) -> DataFrame:
    """Per-eval-document contamination vs the training corpus.

    Returns ``(doc id, n_ngrams, n_contaminated, fraction)``: the count of
    the document's DISTINCT word *n*-grams, how many of those occur
    anywhere in *train_df*, and their ratio (0.0 for documents with no
    *n*-gram, deterministically).  Typical gate: drop eval docs with
    ``fraction`` above ~0.1-0.3, or excise the matching train docs.
    """
    ev = _doc_ngram_hashes(eval_df, id_col, text_col, n)
    tr = _doc_ngram_hashes(train_df, id_col, text_col, n).filter(
        F.col("_h").isNotNull()
    )
    # derated gate: see NGRAM_BROADCAST_EXPANSION — the broadcast relation
    # is the n-gram set, two orders of magnitude larger than the estimated
    # (compressed) text bytes in the measured worst case
    if broadcast_eval is None:
        broadcast_eval = _ngram_broadcast_ok(eval_df, text_col)
    train_small = _ngram_broadcast_ok(train_df, text_col)
    if broadcast_eval:
        # scored side is small (the usual benchmark-vs-corpus direction):
        # broadcast ITS n-gram set, scan the big train side once against it
        eval_set = ev.select("_h").filter(F.col("_h").isNotNull()).distinct()
        hits = (
            tr.select("_h")
            .join(F.broadcast(eval_set), "_h", "left_semi")
            .distinct()
        )
        marked = ev.join(
            F.broadcast(hits.withColumn("_hit", F.lit(1))), "_h", "left"
        )
    elif train_small:
        # reversed direction (score a big train corpus against a small
        # benchmark, e.g. decontaminating train): broadcast the SMALL
        # train/benchmark n-gram set and mark the big side in one pass —
        # no intersection stage, no big-side n-gram shuffle
        tr_set = tr.select("_h").distinct().withColumn("_hit", F.lit(1))
        marked = ev.join(F.broadcast(tr_set), "_h", "left")
    else:
        # corpus-vs-corpus overlap: both sides genuinely large — shuffle
        # hash join, AQE re-plans from exact shuffle statistics
        eval_set = ev.select("_h").filter(F.col("_h").isNotNull()).distinct()
        hits = tr.select("_h").join(eval_set, "_h", "left_semi").distinct()
        marked = ev.join(hits.withColumn("_hit", F.lit(1)), "_h", "left")
    return marked.groupBy(F.col("_id").alias(id_col)).agg(
        F.count("_h").alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
    ).withColumn(
        "fraction",
        F.when(
            F.col("n_ngrams") > 0,
            F.col("n_contaminated") / F.col("n_ngrams"),
        ).otherwise(F.lit(0.0)),
    )
