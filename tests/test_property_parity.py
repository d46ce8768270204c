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
