"""Additional edge-case parity with the reference test suite
(/root/reference/tests/test_validators.py nullability matrices etc.)."""

from typing import Literal, Optional

import pytest

import patito_spark as pt


def _errs(e):
    return e.value.errors()


class Inner(pt.Model):
    x: int = pt.Field(gt=0)


# -- F9: Optional × list × struct nullability matrix ---------------------------


def test_optional_list_of_struct_null_column(spark):
    class M(pt.Model):
        items: Optional[list[Inner]]

    df = spark.createDataFrame([(None,)], "items array<struct<x: bigint>>")
    M.validate(df)


def test_optional_list_of_struct_still_validates_members(spark):
    class M(pt.Model):
        items: Optional[list[Inner]]

    df = spark.createDataFrame(
        [(None,), ([(-5,)],)], "items array<struct<x: bigint>>"
    )
    with pytest.raises(pt.DataFrameValidationError) as e:
        M.validate(df)
    assert _errs(e) == [
        {
            "loc": ("items.x",),
            "msg": "1 row with out of bound values.",
            "type": "value_error.rowvalue",
        }
    ]


def test_empty_lists_skipped(spark):
    class M(pt.Model):
        items: list[Inner]

    df = spark.createDataFrame([([],)], "items array<struct<x: bigint>>")
    M.validate(df)  # empty lists never reach the recursion (reference :304)


def test_doubly_nested_struct_loc(spark):
    class Mid(pt.Model):
        inner: Inner

    class Outer(pt.Model):
        mid: Mid

    df = spark.createDataFrame(
        [(((0,),),)], "mid struct<inner: struct<x: bigint>>"
    )
    with pytest.raises(pt.DataFrameValidationError) as e:
        Outer.validate(df)
    assert _errs(e)[0]["loc"] == ("mid.inner.x",)


def test_struct_missing_subfield(spark):
    class Outer(pt.Model):
        s: Inner

    df = spark.createDataFrame([((1,),)], "s struct<y: bigint>")
    with pytest.raises(pt.DataFrameValidationError) as e:
        Outer.validate(df)
    locs = {err["loc"] for err in _errs(e)}
    assert ("s.x",) in locs  # missing nested column, dotted loc
    assert ("s.y",) in locs  # superfluous nested column


# -- optional enum with violation (anyOf branch, reference :938-946) ----------


def test_optional_enum_violation(spark):
    class M(pt.Model):
        column: Optional[Literal["a", "b"]]

    df = spark.createDataFrame([("a",), (None,), ("z",)], "column string")
    with pytest.raises(pt.DataFrameValidationError) as e:
        M.validate(df)
    assert _errs(e) == [
        {
            "loc": ("column",),
            "msg": "Rows with invalid values: {'z'}.",
            "type": "value_error.rowvalue",
        }
    ]


# -- optional bounds fire only on non-null values (anyOf, reference :1058-1075)


def test_optional_bounds_on_values(spark):
    class M(pt.Model):
        column: Optional[int] = pt.Field(ge=10)

    ok = spark.createDataFrame([(None,), (11,)], "column int")
    M.validate(ok)
    bad = spark.createDataFrame([(None,), (3,)], "column int")
    with pytest.raises(pt.DataFrameValidationError) as e:
        M.validate(bad)
    assert _errs(e)[0]["msg"] == "1 row with out of bound values."


# -- multiple errors accumulate across columns (reference Product docstring) --


def test_product_docstring_three_errors(spark):
    class Product(pt.Model):
        product_id: int = pt.Field(unique=True)
        temperature_zone: Literal["dry", "cold", "frozen"]
        is_for_sale: bool

    df = spark.createDataFrame(
        [(1, "dry"), (1, "oven"), (3, "cold")],
        "product_id bigint, temperature_zone string",
    )
    with pytest.raises(pt.DataFrameValidationError) as e:
        Product.validate(df)
    errors = _errs(e)
    assert len(errors) == 3
    by_loc = {err["loc"][0]: err for err in errors}
    assert by_loc["is_for_sale"]["msg"] == "Missing column"
    assert by_loc["product_id"]["msg"] == "2 rows with duplicated values."
    assert by_loc["temperature_zone"]["msg"] == "Rows with invalid values: {'oven'}."


# -- validation returns the frame unchanged (reference test_polars.py:583-590)


def test_validate_passthrough_values(spark):
    class M(pt.Model):
        a: int
        b: str

    df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
    out = M.validate(df)
    assert sorted(map(tuple, out.as_spark().collect())) == [(1, "x"), (2, "y")]


# -- constraints referencing other columns validate dependencies exist --------


def test_unknown_constraint_column_fails_at_runtime(spark):
    class M(pt.Model):
        a: int = pt.Field(constraints=pt.col("ghost") > 0)

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(Exception):  # Spark analysis error surfaces
        M.validate(df)
