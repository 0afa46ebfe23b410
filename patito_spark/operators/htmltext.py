"""HTML → text extraction over binary html columns.

The north-rule input table carries ``html: binary`` next to the extracted
``text`` (BASELINE.json input_hint); this operator is the extraction
stage itself: a REAL stdlib ``html.parser`` walk (no external library)
that drops script/style/template subtrees and markup, resolves character
references, and collapses whitespace — deterministic, so re-extraction
is byte-comparable against the stored ``text`` with ``plans.parity``.

Spark shape: sanctioned Arrow ``mapInPandas`` (parsing is genuinely
per-payload Python work, same tier as the image/audio decoders), one
scan, no shuffle; undecodable payloads get NULL text + ``extract_error``
instead of failing the task — the multimodal quarantine contract.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("extract_error", T.StringType()),
    ]
)

#: subtrees whose character data is markup payload, not document text
_SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})

#: block-level tags that separate words (inline tags like <b> do not)
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
        "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
        "header", "footer", "body", "blockquote", "pre", "hr",
    }
)


def extract_text_bytes(payload: bytes) -> str:
    """Extract visible text from one HTML payload (driver/executor-safe,
    pure stdlib).  UTF-8 with latin-1 fallback; whitespace collapsed."""
    from html.parser import HTMLParser  # noqa: PLC0415

    try:
        doc = payload.decode("utf-8")
    except UnicodeDecodeError:
        doc = payload.decode("latin-1")

    class _Text(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.chunks: list = []
            self._skip = 0

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag in _SKIP_TAGS:
                self._skip += 1
            elif tag in _BLOCK_TAGS:
                self.chunks.append(" ")

        def handle_endtag(self, tag: str) -> None:
            if tag in _SKIP_TAGS:
                if self._skip > 0:
                    self._skip -= 1
            elif tag in _BLOCK_TAGS:
                self.chunks.append(" ")

        def handle_data(self, data: str) -> None:
            if not self._skip and data:
                self.chunks.append(data)

    parser = _Text()
    parser.feed(doc)
    parser.close()
    return " ".join("".join(parser.chunks).split())


def extract_text(
    df: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """(id, text, extract_error) per row; corrupt payloads quarantine."""
    import pandas as pd  # noqa: PLC0415

    def _run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = {"id": [], "text": [], "extract_error": []}
            for i, payload in zip(pdf[id_col], pdf[html_col]):
                out["id"].append(i)
                try:
                    out["text"].append(extract_text_bytes(payload or b""))
                    out["extract_error"].append(None)
                except Exception as exc:  # noqa: BLE001 - quarantine contract
                    out["text"].append(None)
                    out["extract_error"].append(str(exc)[:200])
            yield pd.DataFrame(out)

    return df.select(id_col, html_col).mapInPandas(_run, EXTRACT_SCHEMA)
