"""Cross-document line deduplication (boilerplate removal).

The CCNet-style cleaning step the per-document signals can't express:
navigation bars, cookie banners, copyright footers and other boilerplate
repeat VERBATIM across many documents of a crawl, and removing every line
that occurs in ``min_count``-or-more documents strips them corpus-wide in
one pass.  (Per-document repetition scoring — ``functions/text.py::
repetition_fraction`` — catches within-doc loops; this operator catches
across-doc duplication, which needs a global count.)

The reference validates single tables and has no analogue; this is
north-rule training-pipeline surface, same family as
``operators/dedup.py`` (reference: /root/reference/src/patito/validators.py
has no corpus-level operators).

Scale design (the corpus text never shuffles by line):

1. Per-row line split + per-line 16-hex md5 prefixes stay in the row.
2. The duplicated-line set is a ``groupBy(line_hash)`` count — the only
   shuffle carries (8..16-byte hash) partial counts, and Spark's map-side
   combine absorbs boilerplate heat exactly like the uniqueness check.
3. Per-document REMOVAL INDEXES come from a (doc, idx, hash) explode
   left-semi-joined against the duplicated set (AQE broadcasts the set
   when small — the common case: distinct boilerplate lines ≪ corpus)
   then ``groupBy(doc)`` of integers — text is never in this shuffle.
4. The rewrite joins the removal-index lists back on the id and filters
   the line array with a two-arg (element, index) lambda — one join whose
   corpus side is co-located for free when the corpus is bucketed by id
   (``sources.io.write_bucketed_table``), and whose other side holds only
   int arrays for docs that actually contain boilerplate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _materialize


def _split_lines(col, sep: str):
    # F.split takes a Java REGEX; the separator is a literal string, so
    # escape it (re.escape backslash-escapes every non-alphanumeric char,
    # which Java regexes accept as literals) — an unescaped '|' or '.'
    # would otherwise split between every character and silently corrupt
    # the cleaned corpus
    return F.split(col, re.escape(sep))


def _line_hash(col):
    # 16-hex md5 prefix: collision probability ~n²/2^65 — at 10^10 distinct
    # lines that is ~1e-2 expected collisions corpus-wide, each of which
    # could at worst drop one innocent line; acceptable for cleaning
    return F.substring(F.md5(col), 1, 16)


def duplicated_line_stats(
    df: DataFrame,
    text_col: str,
    min_count: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """``(line_hash, n_docs)`` for every line occurring in ≥ *min_count*
    documents (each document counts a line once — within-doc repeats don't
    inflate the boilerplate signal).  Empty lines never participate, so
    blank-line paragraph separators survive the cleaning pass."""
    lines = df.select(
        F.explode_outer(
            F.array_distinct(
                F.transform(
                    F.filter(
                        _split_lines(F.col(text_col), sep),
                        lambda l: l != "",
                    ),
                    _line_hash,
                )
            )
        ).alias("_pt_h")
    ).filter(F.col("_pt_h").isNotNull())
    return (
        lines.groupBy("_pt_h")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_count)
        .select(F.col("_pt_h").alias("line_hash"), "n_docs")
    )


def remove_duplicated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 2,
    sep: str = "\n",
    out_col: str = "text_clean",
) -> DataFrame:
    """Strip every line that occurs in ≥ *min_count* documents.

    Returns *df*'s columns plus ``out_col`` (the cleaned text, original
    line order preserved, lines rejoined with *sep*), ``n_lines`` (before)
    and ``n_removed``.  ALL copies of a duplicated line are removed — the
    boilerplate semantics; documents reduced to nothing get ``''``.  NULL
    text stays NULL with n_lines = n_removed = 0.

    Deterministic: removal depends only on corpus content, never on
    partitioning or row order.
    """
    reserved = {out_col, "n_lines", "n_removed"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input already has reserved output column(s) {sorted(reserved)}; "
            "rename them (or pass out_col=) before remove_duplicated_lines"
        )
    lines_arr = _split_lines(F.col(text_col), sep)
    dup = duplicated_line_stats(df, text_col, min_count, sep).select(
        F.col("line_hash").alias("_pt_h")
    )
    exploded = df.select(
        F.col(id_col).alias("_pt_id"),
        F.posexplode(F.transform(lines_arr, _line_hash)).alias(
            "_pt_idx", "_pt_h"
        ),
    )
    removals = (
        exploded.join(dup, "_pt_h", "left_semi")
        .groupBy("_pt_id")
        .agg(F.collect_list("_pt_idx").alias("_pt_rm"))
    )
    joined = df.join(
        removals, df[id_col] == removals["_pt_id"], "left"
    ).drop("_pt_id")
    # materialize the split ONCE per row (Generate barrier): the filter
    # lambda, the rejoin, and n_lines all reference it, and Catalyst does
    # not CSE across higher-order-function boundaries (repo invariant)
    joined = _materialize(joined, _pt_lines=lines_arr)
    la = F.col("_pt_lines")
    rm = F.coalesce(F.col("_pt_rm"), F.array().cast("array<int>"))
    kept = F.filter(la, lambda l, i: ~F.array_contains(rm, i))
    return (
        joined.withColumn(
            out_col,
            F.when(
                F.col(text_col).isNotNull(), F.array_join(kept, sep)
            ),
        )
        .withColumn(
            "n_lines",
            F.when(F.col(text_col).isNotNull(), F.size(la))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn("n_removed", F.size(rm).cast("long"))
        .drop("_pt_rm", "_pt_lines")
    )
