"""URL parsing helpers for web-crawl tables.

The north-rule table is keyed by ``url``, and its dominant skew axis is the
URL's domain (a handful of hot domains hold a large share of a crawl).
These are native Column expressions — ``F.parse_url`` where available, and
portable ``regexp_extract`` forms for the pieces oracle-checked queries
need to reproduce in other engines.

Heuristics, not RFC 3986: a crawl pipeline needs a grouping key that is
cheap, deterministic, and stable — not a full resolver.  No public-suffix
list is bundled (that's a data file, not code); ``registrable_domain``
uses a documented last-two-labels approximation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: host extraction: scheme-relative or absolute URLs; stops at :port /path ?q #f
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//([^/:?#]+)"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*):"
_PATH_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//[^/?#]*([^?#]*)"


def url_host(url: Column) -> Column:
    """Lower-cased host ('' when the URL has no authority component)."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def registrable_domain(url: Column) -> Column:
    """Last two host labels (``a.b.example.com`` → ``example.com``).

    A public-suffix-list lookup would treat ``example.co.uk`` correctly;
    this approximation is what most crawl pipelines use as a first-pass
    grouping key and is exactly reproducible in any SQL engine.
    """
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def domain_counts(df, url_col: str) -> "DataFrame":  # noqa: F821
    """Rows per registrable domain, descending — the hot-domain report the
    skew utilities (``plans.skew``) consume to pick salting targets."""
    return (
        df.groupBy(registrable_domain(F.col(url_col)).alias("domain"))
        .agg(F.count(F.lit(1)).cast("long").alias("rows"))
        .orderBy(F.col("rows").desc(), F.col("domain"))
    )
