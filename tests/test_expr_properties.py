"""Property-based tests for the expression DSL (hypothesis).

The DSL is the engine's serialization boundary (specs ship to executors /
checkpoint tables), so round-trip fidelity and introspection consistency
are worth fuzzing beyond examples.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from patito_spark.expr import Expr, col, lit

_names = st.sampled_from(["a", "b", "c", "_", "x1", "long_name"])
_scalars = st.one_of(
    st.integers(-1000, 1000),
    st.floats(-100, 100, allow_nan=False),
    st.text(max_size=8),
    st.booleans(),
)


def _exprs(depth: int = 3) -> st.SearchStrategy:
    leaf = st.one_of(_names.map(col), _scalars.map(lit))
    if depth == 0:
        return leaf
    sub = _exprs(depth - 1)
    binop = st.tuples(
        st.sampled_from(["add", "sub", "mul", "eq", "lt", "ge", "and", "or", "mod"]),
        sub,
        sub,
    ).map(lambda t: Expr(t[0], t[1], t[2]))
    unary = st.tuples(
        st.sampled_from(["not", "neg", "is_null", "abs", "sum", "mean", "min",
                         "max", "count", "lower", "upper", "trim"]),
        sub,
    ).map(lambda t: Expr(t[0], t[1]))
    methods = st.one_of(
        st.tuples(sub, st.sampled_from(["p1", "p2"])).map(
            lambda t: t[0].rlike(t[1])
        ),
        st.tuples(sub, st.sampled_from(["p", "q"])).map(
            lambda t: t[0].str_starts_with(t[1])
        ),
        st.tuples(sub, st.sampled_from(["p", "q"]), st.booleans()).map(
            lambda t: t[0].str_contains(t[1], literal=t[2])
        ),
        st.tuples(sub, _scalars).map(lambda t: t[0].fill_null(t[1])),
    )
    return st.one_of(leaf, binop, unary, methods)


@settings(max_examples=200, deadline=None)
@given(_exprs())
def test_serialize_roundtrip_identity(e):
    back = Expr.deserialize(e.serialize())
    assert back.serialize() == e.serialize()
    assert back.references() == e.references()
    assert back.is_aggregate() == e.is_aggregate()


@settings(max_examples=200, deadline=None)
@given(_exprs())
def test_substitute_renames_all_references(e):
    mapping = {name: f"renamed_{name}" for name in e.references()}
    renamed = e.substitute(mapping)
    assert renamed.references() == frozenset(mapping.values())


@settings(max_examples=200, deadline=None)
@given(_exprs())
def test_extract_aggregates_leaves_pure_row_expr(e):
    acc = {}
    pure = e.extract_aggregates(acc)
    assert not pure.is_aggregate()
    for sub in acc.values():
        assert sub.is_aggregate()
    # placeholders appear exactly as references when aggregates existed
    if e.is_aggregate():
        assert acc
        assert any(ph in pure.references() for ph in acc)


@settings(max_examples=100, deadline=None)
@given(_exprs())
def test_substitute_values_eliminates_mapped_refs(e):
    refs = e.references()
    if not refs:
        return
    target = sorted(refs)[0]
    out = e.substitute_values({target: 42})
    assert target not in out.references()
