"""Property-based parity: the fused Spark pass vs a pure-Python oracle
implementing the reference's scalar semantics (int(v)/float(v) coercion,
range constraints, required-null) — randomized inputs via hypothesis.

One hypothesis example = one small Spark job, so max_examples stays low;
each example still covers a whole randomized batch of rows.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vldt_spark.engine import ValidationEngine
from vldt_spark.fields import Field
from vldt_spark.model import Model


class PropModel(Model):
    rid: int
    count: int = Field(ge=0, le=1000)
    score: float
    name: str = Field(min_size=1)


def py_reference_violations(rid, count, score, name):
    """The reference's per-object behavior for this model, in plain Python
    (validation_primitives.cpp:63-146, data_model.cpp:192-212)."""
    out = set()
    if count is None:
        out.add(("count", "Expected type int, got NoneType"))
    else:
        try:
            c = int(count)
        except (TypeError, ValueError):
            out.add(("count", "Expected type int, got str"))
        else:
            if c < 0:
                out.add(("count", "Value out of range: expected >= 0"))
            elif c > 1000:
                out.add(("count", "Value out of range: expected <= 1000"))
    if score is None:
        out.add(("score", "Expected type float, got NoneType"))
    if name is None:
        out.add(("name", "Expected type str, got NoneType"))
    elif len(name) < 1:
        out.add(("name", "Expected at least 1 characters"))
    return out


count_strat = st.one_of(
    st.none(),
    st.integers(-5000, 5000).map(str),  # numeric strings: coerce
    st.text(alphabet="xyz", min_size=1, max_size=3),  # non-numeric: violate
    st.just(""),
)
row_strat = st.tuples(
    count_strat,
    st.one_of(st.none(), st.integers(-100, 100)),  # score arrives as long
    st.one_of(st.none(), st.just(""), st.text(alphabet="ab", max_size=4)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row_strat, min_size=1, max_size=20))
def test_scalar_semantics_match_python_reference(spark, rows):
    data = [(i, c, s, n) for i, (c, s, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, count string, score long, name string")
    res = ValidationEngine(PropModel).run(df, id_cols=["rid"])
    got = {}
    for r in res.violations().collect():
        got.setdefault(r["rid"], set()).add((r["path"], r["msg"]))
    for rid, c, s, n in data:
        expect = py_reference_violations(rid, c, s, n)
        assert got.get(rid, set()) == expect, (
            f"row {rid}: input (count={c!r}, score={s!r}, name={n!r}) "
            f"spark={got.get(rid, set())} python={expect}"
        )


class ListModel(Model):
    rid: int
    tokens: list[int] = Field(element_ge=0, element_le=100, min_size=1)


def py_list_violations(rid, tokens):
    """Reference container semantics: fail-fast per constraint with the
    FIRST violating index's dotted path (validation_containers.cpp:92-95);
    collect-all ACROSS constraints (data_model.cpp:197-211)."""
    out = set()
    if tokens is None:
        out.add(("tokens", "Expected type list, got NoneType"))
        return out
    null_idx = next((i for i, x in enumerate(tokens) if x is None), None)
    if null_idx is not None:
        out.add((f"tokens.{null_idx}", "Expected type int, got NoneType"))
    lo_idx = next((i for i, x in enumerate(tokens) if x is not None and x < 0), None)
    if lo_idx is not None:
        out.add((f"tokens.{lo_idx}", "Value out of range: expected >= 0"))
    hi_idx = next((i for i, x in enumerate(tokens) if x is not None and x > 100), None)
    if hi_idx is not None:
        out.add((f"tokens.{hi_idx}", "Value out of range: expected <= 100"))
    if len(tokens) < 1:
        out.add(("tokens", "Expected at least 1 elements"))
    return out


elem_strat = st.one_of(st.none(), st.integers(-50, 150))
tokens_strat = st.one_of(st.none(), st.lists(elem_strat, max_size=8))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(tokens_strat, min_size=1, max_size=15))
def test_container_semantics_match_python_reference(spark, rows):
    data = [(i, t) for i, t in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, tokens array<int>")
    res = ValidationEngine(ListModel).run(df, id_cols=["rid"])
    got = {}
    for r in res.violations().collect():
        got.setdefault(r["rid"], set()).add((r["path"], r["msg"]))
    for rid, toks in data:
        expect = py_list_violations(rid, toks)
        assert got.get(rid, set()) == expect, (
            f"row {rid}: tokens={toks!r} spark={got.get(rid, set())} python={expect}"
        )


class UnionNum(Model):
    rid: int
    val: "int | float"


def py_union_violations(val):
    """Reference ordered union resolution (validation_containers.cpp:297-326):
    conversion attempts in declared order, int then float; both fail -> error."""
    if val is None:
        return {("val", "Expected type int | float, got NoneType")}
    for conv in (int, float):
        try:
            conv(val)
            return set()
        except (TypeError, ValueError):
            continue
    return {("val", "Expected type int | float, got str")}


union_strat = st.one_of(
    st.none(),
    st.integers(-10**6, 10**6).map(str),
    st.floats(-1e6, 1e6, allow_nan=False).map(lambda f: format(f, ".4f")),
    st.text(alphabet="pq.", min_size=1, max_size=4),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(union_strat, min_size=1, max_size=20))
def test_union_semantics_match_python_reference(spark, rows):
    data = [(i, v) for i, v in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, val string")
    res = ValidationEngine(UnionNum).run(df, id_cols=["rid"])
    got = {}
    for r in res.violations().collect():
        got.setdefault(r["rid"], set()).add((r["path"], r["msg"]))
    for rid, v in data:
        expect = py_union_violations(v)
        assert got.get(rid, set()) == expect, (
            f"row {rid}: val={v!r} spark={got.get(rid, set())} python={expect}"
        )


class InnerP(Model):
    a: int
    b: str


class OuterP(Model):
    rid: int
    inner: InnerP


def py_nested_violations(inner):
    """Mirror of _model_value semantics: null struct -> one outer violation,
    nested errors re-parented under dotted paths (validation.cpp:64-84)."""
    if inner is None:
        return {("inner", "Expected type InnerP, got NoneType")}
    a, b = inner
    out = set()
    if a is None:
        out.add(("inner.a", "Expected type int, got NoneType"))
    else:
        try:
            int(a)
        except (TypeError, ValueError):
            out.add(("inner.a", "Expected type int, got str"))
    if b is None:
        out.add(("inner.b", "Expected type str, got NoneType"))
    return out


inner_strat = st.one_of(
    st.none(),
    st.tuples(
        st.one_of(st.none(), st.integers(-999, 999).map(str), st.just("zz")),
        st.one_of(st.none(), st.text(alphabet="mn", max_size=3)),
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(inner_strat, min_size=1, max_size=15))
def test_nested_struct_semantics_match_python_reference(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("rid", T.LongType()),
        T.StructField("inner", T.StructType([
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
        ])),
    ])
    data = [(i, r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(data, schema)
    res = ValidationEngine(OuterP).run(df, id_cols=["rid"])
    got = {}
    for r in res.violations().collect():
        got.setdefault(r["rid"], set()).add((r["path"], r["msg"]))
    for rid, inner in data:
        expect = py_nested_violations(inner)
        assert got.get(rid, set()) == expect, (
            f"row {rid}: inner={inner!r} spark={got.get(rid, set())} python={expect}"
        )


# -- Suite row-local tier vs Python oracle --------------------------------

_suite_row = st.tuples(
    st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    st.one_of(st.none(), st.sampled_from(["ok-1", "ok-22", "bad", ""])),
    st.one_of(st.none(), st.sampled_from(["a", "b", "zz"])),
)


@given(rows=st.lists(_suite_row, min_size=1, max_size=30))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_suite_row_local_matches_python_oracle(spark, rows):
    from vldt_spark.checks.suite import Suite, expect

    df = spark.createDataFrame(rows, "x double, name string, seg string")
    suite = Suite(
        [
            expect.not_null("x"),
            expect.null_rate_below("name", 0.6),
            expect.range("x", lo=-50.0, hi=50.0, hi_strict=True),
            expect.regex("name", r"^ok-\d+$"),
            expect.isin("seg", ["a", "b"]),
        ]
    )
    rep = {(r["check"], r["column"]): r["metric"] for r in suite.run(df).collect()}

    n = len(rows)
    exp_null_x = sum(1 for x, _, _ in rows if x is None)
    exp_nullrate = round(sum(1 for _, s, _ in rows if s is None) / n, 6)
    exp_range = sum(
        1 for x, _, _ in rows if x is not None and (x < -50.0 or x >= 50.0)
    )
    import re as _re

    exp_regex = sum(
        1 for _, s, _ in rows if s is not None and not _re.match(r"^ok-\d+$", s)
    )
    exp_isin = sum(1 for _, _, g in rows if g is not None and g not in ("a", "b"))

    assert rep[("not_null", "x")] == float(exp_null_x)
    assert abs(rep[("null_rate_below", "name")] - exp_nullrate) < 1e-9
    assert rep[("range", "x")] == float(exp_range)
    assert rep[("regex", "name")] == float(exp_regex)
    assert rep[("isin", "seg")] == float(exp_isin)
