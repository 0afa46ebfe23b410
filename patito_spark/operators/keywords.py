"""Corpus-relative keyword extraction (TF-IDF-style term scoring).

Per-document top-k salient terms scored by term frequency × corpus
inverse document frequency — the classic signal for topic tagging,
quality heuristics ("is this page about anything?"), and building cheap
sparse retrieval indexes over a crawl.

The idf weight is the RATIONAL smoothed form ``(N + 1) / (df + 1)``
rather than its logarithm: integer-derived numerator/denominator and one
IEEE-correctly-rounded division make every score bit-identical across
engines (log is not correctly rounded in either the JVM or libm, and a
1-ulp score difference can flip a top-k rank), and the per-document
RANKING is identical either way because log is monotonic.  Consumers who
need calibrated magnitudes can take ``log(score/tf)`` downstream.

Scale design: one explode of the token array into (doc, term) pairs,
two partial-aggregated shuffles (term counts per doc, document
frequency per term), a term-keyed join (AQE-broadcastable when the
vocabulary is small), and a per-document window rank (hash-partitioned,
local sort — never a global sort).  The shuffle carries (doc id, term,
count) triples, never document text — and the text is SCANNED ONCE:
both the tf side and the docfreq side of the join consume the same
(doc, term) aggregate, whose exchange is materialized once at runtime
(ReusedExchange; the docfreq count carries an optimizer fence so column
pruning cannot split the shared subtree — same technique as
``operators/lines.py``, asserted by test_keyword_tfidf_single_text_scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens


def keyword_tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-*k* terms per document: ``(id, term, tf, score, rank)``.

    ``tf`` is the term's in-document occurrence count; ``score`` is
    ``tf × (N + 1) / (df + 1)`` with N the corpus document count and
    ``df`` the number of documents containing the term.  Ties break on
    term ascending, so the output is fully deterministic.  Terms in
    fewer than *min_df* documents are dropped before ranking (noise /
    hapax suppression).
    """
    pairs = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    tf = pairs.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("tf"))
    # Optimizer fence (see operators/lines.py): ``tf >= 1`` is always true
    # (a count over a non-empty group) and the coalesced _id is never
    # null-counted away, but Catalyst can prove neither — so this branch
    # keeps referencing the SAME columns the join branch needs, column
    # pruning cannot narrow the shared (doc, term) aggregate, and its
    # exchange is reused instead of re-scanning the corpus text.  The
    # count value is identical to count(1): one per (doc, term) row.
    # the id is cast to string inside the coalesce so the fence
    # type-checks for any id type (see operators/lines.py — an int
    # literal has no implicit common type with date/timestamp/binary)
    docfreq = tf.groupBy("_t").agg(
        F.count(
            F.when(
                F.col("tf") >= 1,
                F.coalesce(F.col("_id").cast("string"), F.lit("")),
            )
        ).alias("_df")
    )
    # the corpus document count N is folded into the PLAN as a broadcast
    # one-row aggregate instead of a separate df.count() action: one fewer
    # job, and when df is a filtered/derived frame the corpus is not
    # re-scanned before scoring starts (the count subtree prunes every
    # column, so its scan reads only row-group metadata).  Counts ALL rows
    # of df — including zero-token documents — matching count()'s N.
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("_nd"))
    scored = (
        tf.join(docfreq.filter(F.col("_df") >= min_df), "_t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.col("_nd") + 1) / (F.col("_df") + 1),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("_t").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            F.col("_t").alias("term"),
            "tf",
            F.round("score", 6).alias("score"),
            "rank",
        )
    )
