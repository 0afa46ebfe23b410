"""Schema evolution: structured diff between two model versions.

Pipelines at the north-rule scale redeploy with evolving specs; the
dangerous changes are the ones that silently invalidate data already in
the lake or break downstream readers.  ``diff_models`` compares two
model classes column by column and classifies every change, flagging the
breaking ones:

- **added** non-nullable columns without a default (existing rows cannot
  satisfy them);
- **removed** columns (downstream readers lose them);
- **retyped** columns outside Spark's lossless widening lattice
  (byte→short→int→long, float→double, int→long, etc.);
- **tightened nullability** (Optional → required);
- **tightened constraints** (bounds narrowed, new pattern/enum/unique —
  previously-valid rows may now fail).

Loosening (widening a bound, making a column Optional, dropping a
constraint) is reported but not breaking.  Pure metadata — no Spark
session, no job.
"""

from __future__ import annotations

from pyspark.sql import types as T

from .spec import MISSING

#: lossless widenings Spark casts implicitly without data change
_WIDENINGS = {
    (T.ByteType, T.ShortType),
    (T.ByteType, T.IntegerType),
    (T.ByteType, T.LongType),
    (T.ShortType, T.IntegerType),
    (T.ShortType, T.LongType),
    (T.IntegerType, T.LongType),
    (T.FloatType, T.DoubleType),
    (T.ByteType, T.DoubleType),
    (T.ShortType, T.DoubleType),
    (T.IntegerType, T.DoubleType),
}

_CONSTRAINT_FIELDS = (
    "ge",
    "gt",
    "le",
    "lt",
    "multiple_of",
    "const",
    "pattern",
    "min_length",
    "max_length",
    "allowed_values",
    "unique",
)


def _is_widening(old: T.DataType, new: T.DataType) -> bool:
    return (type(old), type(new)) in _WIDENINGS


def _tightened(field: str, old, new) -> bool:
    """True when the new constraint can fail rows the old one accepted."""
    if old == new:
        return False
    if new is None or new is False:
        return False  # constraint dropped/loosened
    if old is None or old is False:
        return True  # constraint introduced
    if field in ("ge", "gt", "min_length"):
        return new > old  # raised lower bound
    if field in ("le", "lt", "max_length"):
        return new < old  # lowered upper bound
    if field == "allowed_values":
        return not set(new) >= set(old)  # domain shrank
    return True  # pattern/const/multiple_of changed → assume tighter


def diff_models(old: type, new: type) -> dict:
    """Structured change report between two model classes.

    Returns ``{added, removed, retyped, nullability, constraints,
    breaking}`` where each entry lists per-column dicts with a
    ``breaking`` flag, and the top-level ``breaking`` is their OR.
    """
    os_, ns_ = old.__column_specs__, new.__column_specs__
    report: dict = {
        "added": [],
        "removed": [],
        "retyped": [],
        "nullability": [],
        "constraints": [],
    }
    for name, spec in ns_.items():
        if name not in os_:
            report["added"].append(
                {
                    "column": name,
                    "nullable": spec.nullable,
                    "breaking": not spec.nullable and spec.default is MISSING,
                }
            )
    for name in os_:
        if name not in ns_:
            report["removed"].append({"column": name, "breaking": True})
    for name, nspec in ns_.items():
        ospec = os_.get(name)
        if ospec is None:
            continue
        if nspec.dtype.simpleString() != ospec.dtype.simpleString():
            report["retyped"].append(
                {
                    "column": name,
                    "old": ospec.dtype.simpleString(),
                    "new": nspec.dtype.simpleString(),
                    "breaking": not _is_widening(ospec.dtype, nspec.dtype),
                }
            )
        if nspec.nullable != ospec.nullable:
            report["nullability"].append(
                {
                    "column": name,
                    "old": ospec.nullable,
                    "new": nspec.nullable,
                    "breaking": not nspec.nullable,  # required-ward = breaking
                }
            )
        changed = []
        tightened = False
        for field in _CONSTRAINT_FIELDS:
            ov, nv = getattr(ospec, field), getattr(nspec, field)
            if ov != nv:
                changed.append(field)
                tightened = tightened or _tightened(field, ov, nv)
        if changed:
            report["constraints"].append(
                {"column": name, "changed": changed, "breaking": tightened}
            )
    report["breaking"] = any(
        entry["breaking"] for bucket in report.values() for entry in bucket
        if isinstance(entry, dict)
    )
    return report
