"""Composable corpus-cleaning pipeline — the standard first pass of a
training-data build (language filter → length bounds → quality threshold →
exact dedup).

Plan shape at 100 TB: every filter is a native Column predicate applied
BEFORE the dedup shuffle, so Catalyst pushes what it can into the scan and
the fingerprint shuffle only carries surviving rows.  The dedup stage is
:func:`patito_spark.operators.dedup.exact_dedup` (``min_by`` aggregate —
map-side combine, no per-group sort).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score
from .dedup import exact_dedup


def clean_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: Optional[str] = None,
    allowed_langs: Optional[Sequence[str]] = None,
    min_chars: Optional[int] = None,
    max_chars: Optional[int] = None,
    min_quality: Optional[float] = None,
    dedup: bool = True,
) -> DataFrame:
    """Filter + dedup a document table; returns the surviving rows.

    All thresholds are optional — pass only the stages the pipeline needs.
    Rows with NULL text never survive a length/quality threshold (a crawl
    row without text is not trainable data).
    """
    out = df
    if lang_col is not None and allowed_langs:
        out = out.filter(F.col(lang_col).isin(*list(allowed_langs)))
    text = F.col(text_col)
    if min_chars is not None:
        out = out.filter(F.char_length(text) >= min_chars)
    if max_chars is not None:
        out = out.filter(F.char_length(text) <= max_chars)
    if min_quality is not None:
        out = out.filter(quality_score(text) >= min_quality)
    if dedup:
        out = exact_dedup(out, id_col, text_col)
    return out


def clean_corpus_stats(cleaned: DataFrame, original: DataFrame) -> DataFrame:
    """One-row retention report for a cleaning run."""
    kept = cleaned.count()
    total = original.count()
    spark = cleaned.sparkSession
    return spark.createDataFrame(
        [(total, kept, round(kept / total, 6) if total else 0.0)],
        "rows_in long, rows_kept long, retention double",
    )
