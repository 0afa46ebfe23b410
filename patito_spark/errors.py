"""Validation error taxonomy and error-dict rendering.

Re-creates the reference taxonomy (patito ``src/patito/exceptions.py:33-205``)
with the same exception class names, ``type`` strings
(``type_error.missingcolumns`` etc.) and flattened error-dict shape
``{"loc": tuple, "msg": str, "type": str}`` so ported tests can assert
identical dicts.  Pure driver-side code — no Spark dependency.
"""

from __future__ import annotations

from collections.abc import Generator, Sequence
from typing import Any, Optional, Union

Loc = tuple[str, ...]
ErrorDict = dict[str, Any]


class ErrorWrapper:
    """Pairs an exception with the column location it occurred at.

    Mirrors patito ``exceptions.py:33-52``.
    """

    __slots__ = ("exc", "_loc")

    def __init__(self, exc: Exception, loc: Union[str, Loc]) -> None:
        self.exc = exc
        self._loc = loc

    def loc_tuple(self) -> Loc:
        if isinstance(self._loc, tuple):
            return self._loc
        return (self._loc,)

    def __repr__(self) -> str:  # pragma: no cover
        return f"ErrorWrapper({self.exc!r}, loc={self.loc_tuple()!r})"


class DataFrameValidationError(ValueError):
    """Raised when DataFrame validation fails.

    ``.errors()`` flattens to the same dict shape as patito
    (``exceptions.py:60-108``).
    """

    def __init__(self, errors: Sequence[Any], model: Any) -> None:
        self.raw_errors = list(errors)
        self.model = model
        self._error_cache: Optional[list[ErrorDict]] = None
        super().__init__(self._render())

    def errors(self) -> list[ErrorDict]:
        if self._error_cache is None:
            self._error_cache = list(flatten_errors(self.raw_errors))
        return self._error_cache

    def _render(self) -> str:
        errors = self.errors()
        no_errors = len(errors)
        model_name = getattr(self.model, "__name__", str(self.model))
        lines = [
            f"{no_errors} validation error{'' if no_errors == 1 else 's'} "
            f"for {model_name}"
        ]
        for error in errors:
            lines.append(" -> ".join(str(e) for e in error["loc"]))
            lines.append(f"  {error['msg']} ({_display_error_type(error)})")
        return "\n".join(lines)

    def __str__(self) -> str:
        return self._render()


def _display_error_type(error: ErrorDict) -> str:
    return "type=" + error["type"]


def flatten_errors(
    errors: Sequence[Any], loc: Optional[Loc] = None
) -> Generator[ErrorDict, None, None]:
    """Flatten nested ErrorWrappers into plain dicts (patito ``exceptions.py:111-127``)."""
    for error in errors:
        if isinstance(error, ErrorWrapper):
            error_loc = (loc + error.loc_tuple()) if loc else error.loc_tuple()
            if isinstance(error.exc, DataFrameValidationError):
                yield from flatten_errors(error.exc.raw_errors, error_loc)
            else:
                yield error_dict(error.exc, error_loc)
        elif isinstance(error, list):
            yield from flatten_errors(error, loc=loc)
        else:
            raise RuntimeError(f"Unknown error object: {error}")


def error_dict(exc: Exception, loc: Loc) -> ErrorDict:
    return {"loc": loc, "msg": str(exc), "type": get_exc_type(exc.__class__)}


_EXC_TYPE_CACHE: dict[type, str] = {}


def get_exc_type(cls: type) -> str:
    """Exception class → dotted type string (patito ``exceptions.py:148-173``)."""
    cached = _EXC_TYPE_CACHE.get(cls)
    if cached is None:
        if issubclass(cls, AssertionError):
            cached = "assertion_error"
        else:
            base = "type_error" if issubclass(cls, TypeError) else "value_error"
            if cls in (TypeError, ValueError):
                cached = base
            else:
                code = cls.__name__.replace("Error", "").lower()
                cached = base + "." + code
        _EXC_TYPE_CACHE[cls] = cached
    return cached


class WrongColumnsError(TypeError):
    """Validation exception for column name mismatches."""


class MissingColumnsError(WrongColumnsError):
    """A dataframe is missing one or more schema columns."""


class SuperfluousColumnsError(WrongColumnsError):
    """A dataframe has one or more non-specified columns."""


class MissingValuesError(ValueError):
    """A non-nullable column contains nulls."""


class ColumnDTypeError(TypeError):
    """A column has a dtype outside the schema's valid set."""


class RowValueError(ValueError):
    """A row holds an impermissible value (bounds / enum / constraint / dup)."""


class RowDoesNotExist(RuntimeError):
    """A single row was expected, but none were returned."""


class MultipleRowsReturned(RuntimeError):
    """A single row was expected, but several were returned."""
