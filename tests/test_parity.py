"""Reference-semantics parity tests.

Each case mirrors a reference pytest case (file:line cited) with the same
inputs, expected violation paths, and message text — the per-object
``TypeError`` JSON map becomes violation rows here (SURVEY.md §5).
"""

from typing import Any, Dict, List, Optional, Tuple, Union

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vldt_spark.engine import ValidationEngine
from vldt_spark.fields import Field
from vldt_spark.model import Model
from vldt_spark.validators import Mode, check, field_validator, model_validator


def viols_of(spark, model, data, schema):
    df = spark.createDataFrame(data, schema=schema)
    res = ValidationEngine(model).run(df, id_cols=[df.columns[0]])
    rows = res.violations().collect()
    return {(r["path"], r["msg"]) for r in rows}


# -- tests/test_vldt.py:122-127 — "Expected type int, got str" --------------


class CountModel(Model):
    rid: int
    count: int


def test_expected_type_int_got_str(spark):
    v = viols_of(
        spark, CountModel, [(1, "not_a_number")], "rid long, count string"
    )
    assert ("count", "Expected type int, got str") in v


def test_numeric_string_coerces(spark):
    # reference coerces via int(v): "30" → 30 (validation_primitives.cpp:63-81)
    v = viols_of(spark, CountModel, [(1, "30")], "rid long, count string")
    assert v == set()


# -- tests/test_vldt.py:340-361 — missing required field ---------------------


def test_missing_required_field(spark):
    v = viols_of(spark, CountModel, [(1,)], "rid long")
    assert ("count", "Missing required field") in v


def test_null_required_field(spark):
    v = viols_of(spark, CountModel, [(1, None)], "rid long, count long")
    assert ("count", "Expected type int, got NoneType") in v


# -- tests/test_vldt.py:196-203 — nested lineage products.0.id ---------------


class Product(Model):
    pid: int
    name: str


class Order(Model):
    oid: int
    products: List[Product]


def test_nested_list_model_path(spark):
    schema = T.StructType(
        [
            T.StructField("oid", T.LongType()),
            T.StructField(
                "products",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("pid", T.StringType()),
                            T.StructField("name", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
    data = [(1, [{"pid": "bad", "name": "x"}, {"pid": "2", "name": "y"}])]
    v = viols_of(spark, Order, data, schema)
    assert ("products.0.pid", "Expected type int, got str") in v
    # second element coerces fine ("2" → 2) and containers fail fast
    assert len(v) == 1


# -- tests/test_vldt.py:246-249 — dict key paths ------------------------------


class Inventory(Model):
    iid: int
    counts: Dict[str, int]


def test_dict_value_path(spark):
    schema = "iid long, counts map<string,string>"
    v = viols_of(spark, Inventory, [(1, {"apples": "ten", "pears": "3"})], schema)
    assert ("counts.apples", "Expected type int, got str") in v


# -- tuple arity (validation_containers.cpp:201) ------------------------------


class Box(Model):
    bid: int
    dimensions: Tuple[int, int]


def test_tuple_arity(spark):
    schema = "bid long, dimensions array<long>"
    v = viols_of(spark, Box, [(1, [1, 2, 3])], schema)
    assert ("dimensions", "Expected tuple of length 2, got 3") in v
    v2 = viols_of(spark, Box, [(1, [4, 5])], schema)
    assert v2 == set()


# -- tests/test_vldt.py:363-380 — Any accepts anything -----------------------


class AnyModel(Model):
    aid: int
    payload: Any


def test_any_accepts_anything(spark):
    v = viols_of(spark, AnyModel, [(1, "x"), (2, None)], "aid long, payload string")
    assert v == set()


# -- tests/test_vldt.py:578-595 — int → float promotion ----------------------


class Price(Model):
    pid: int
    price: float


def test_int_to_float_promotes(spark):
    v = viols_of(spark, Price, [(1, 42)], "pid long, price long")
    assert v == set()


# -- tests/test_fields.py:112-134 — alias precedence, first alias wins -------


class Aliased(Model):
    uid: int
    name: str = Field(alias=["full_name", "username"])


def test_first_alias_wins(spark):
    df = spark.createDataFrame(
        [(1, "from_full", "from_user")], "uid long, full_name string, username string"
    )
    out = ValidationEngine(Aliased).annotate(df)
    row = out.first()
    assert row["name"] == "from_full"
    # round-trip canonicalization: output uses canonical names only
    # (tests/test_fields.py:141-150)
    assert "full_name" not in out.columns


# -- defaults (data_model.cpp:192-212) ----------------------------------------


class WithDefault(Model):
    did: int
    status: str = "active"
    retries: int = Field(default=3)


def test_defaults_fill_missing_and_null(spark):
    df = spark.createDataFrame([(1, None)], "did long, status string")
    out = ValidationEngine(WithDefault).annotate(df)
    row = out.first()
    assert row["status"] == "active"
    assert row["retries"] == 3
    assert row["is_valid"]


# -- tests/test_dict.py:195-220 — extra input keys silently ignored ----------


def test_extra_columns_ignored(spark):
    df = spark.createDataFrame(
        [(1, 5, "junk")], "rid long, count long, extra_column string"
    )
    out = ValidationEngine(CountModel).annotate(df)
    assert out.columns == ["rid", "count", "violations", "is_valid"]
    assert out.first()["is_valid"]


# -- union ordered resolution (tests/test_vldt.py:786-818) --------------------


class UnionModel(Model):
    uid: int
    val: Union[int, str]


def test_union_accepts_both(spark):
    v = viols_of(spark, UnionModel, [(1, "77"), (2, "abc")], "uid long, val string")
    assert v == set()  # str candidate accepts anything


class StrictUnion(Model):
    uid: int
    val: Union[int, float]


def test_union_no_match(spark):
    v = viols_of(spark, StrictUnion, [(1, "xyz")], "uid long, val string")
    assert ("val", "Expected type int | float, got str") in v


# -- optional (validation.cpp:203-208) ----------------------------------------


class Opt(Model):
    oid: int
    note: Optional[str]


def test_optional_accepts_null(spark):
    v = viols_of(spark, Opt, [(1, None)], "oid long, note string")
    assert v == set()


# -- bool truthiness (validation_primitives.cpp:160-178) ----------------------


class Flag(Model):
    fid: int
    on: bool


def test_bool_truthiness(spark):
    df = spark.createDataFrame(
        [(1, "yes"), (2, ""), (3, None)], "fid long, on string"
    )
    out = ValidationEngine(Flag).annotate(df).orderBy("fid").collect()
    assert out[0]["on"] is True   # non-empty string → True (bool("yes"))
    assert out[1]["on"] is False  # empty string → False
    # None on a required bool: violation, value stays null
    assert not out[2]["is_valid"]


# -- ClassVar definition-time check (vldt/models.py:48-55) --------------------


def test_classvar_missing_raises():
    from typing import ClassVar

    with pytest.raises(TypeError, match="Missing class attribute"):

        class Bad(Model):
            version: ClassVar[int]
            x: int


# -- validators (A17-A20) ------------------------------------------------------


class Validated(Model):
    vid: int
    name: str
    age: int = Field(ge=0)

    @field_validator("name", mode=Mode.BEFORE)
    def strip_name(s):
        return s.str.strip()

    @field_validator("age", mode=Mode.AFTER)
    def clamp_age(s):
        return s.clip(upper=120)

    @check("adult", message="Check failed: age must be >= 18")
    def adult(cols):
        return cols.age >= 18


def test_field_validators_and_check(spark):
    df = spark.createDataFrame(
        [(1, "  alice  ", 200), (2, "bob", 15)], "vid long, name string, age long"
    )
    out = ValidationEngine(Validated).annotate(df).orderBy("vid").collect()
    assert out[0]["name"] == "alice"      # BEFORE pandas UDF stripped
    assert out[0]["age"] == 120           # AFTER pandas UDF clamped
    assert out[0]["is_valid"]
    assert not out[1]["is_valid"]         # cross-field @check failed
    msgs = {v["msg"] for v in out[1]["violations"]}
    assert "Check failed: age must be >= 18" in msgs


class BatchValidated(Model):
    bid: int
    total: float

    @model_validator(mode=Mode.BEFORE)
    def double_total(pdf):
        pdf["total"] = pdf["total"] * 2
        return pdf


def test_model_validator_before(spark):
    df = spark.createDataFrame([(1, 10.0)], "bid long, total double")
    out = ValidationEngine(BatchValidated).annotate(df).first()
    assert out["total"] == 20.0


# -- tests/test_vldt.py:469-502 — inheritance merges annotations --------------


class BaseDoc(Model):
    rid: int
    title: str = Field(min_size=1)


class ChildDoc(BaseDoc):
    # re-annotating WITHOUT assigning a new Field keeps the parent's class
    # attribute via MRO (reference: normal Python attribute lookup,
    # vldt/models.py + tests/test_vldt.py:469-502)
    title: str
    # explicit re-assignment overrides
    rid: int = Field(ge=100)
    body: str = Field(not_null=True)


def test_inheritance_merges_and_overrides(spark):
    compiled = ChildDoc.__vldt_compile__()
    names = [s.name for s in compiled.fields]
    assert set(names) == {"rid", "title", "body"}
    # parent's Field constraint inherited through MRO: empty title violates
    v = viols_of(
        spark, ChildDoc, [(101, "", "text")], "rid long, title string, body string"
    )
    assert ("title", "Expected at least 1 characters") in v
    # child's explicit Field override wins: rid now needs >= 100
    v2 = viols_of(
        spark, ChildDoc, [(5, "t", "x")], "rid long, title string, body string"
    )
    assert ("rid", "Value out of range: expected >= 100") in v2
    # child-added field is required
    v3 = viols_of(spark, ChildDoc, [(101, "t", None)], "rid long, title string, body string")
    assert ("body", "Missing required field") in v3
    # fully valid child row
    assert viols_of(spark, ChildDoc, [(101, "t", "x")], "rid long, title string, body string") == set()


# -- tests/test_vldt.py:382-405 — forward references --------------------------


class Tree(Model):
    rid: int
    label: str
    child: Optional["TreeChild"] = None


class TreeChild(Model):
    label: str


def test_forward_reference_resolves(spark):
    import pyspark.sql.types as T

    compiled = Tree.__vldt_compile__()
    child_spec = [s for s in compiled.fields if s.name == "child"][0]
    assert isinstance(child_spec.dtype, T.StructType)
    schema = T.StructType([
        T.StructField("rid", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("child", T.StructType([T.StructField("label", T.LongType())])),
    ])
    data = [(1, "root", (7,))]
    v = viols_of(spark, Tree, data, schema)
    # nested coercion through the forward-referenced model: int -> str is fine
    assert v == set()


# -- tests/test_vldt.py:529-551 — set validation (A13) ------------------------


class TypedTags(Model):
    rid: int
    tags: set[int] = Field()


def test_set_distinct_invariant(spark):
    v = viols_of(spark, TypedTags, [(1, [3, 1, 3])], "rid long, tags array<int>")
    assert ("tags", "Duplicate elements in set") in v
    # all-distinct set is clean
    v2 = viols_of(spark, TypedTags, [(2, [1, 2, 3])], "rid long, tags array<int>")
    assert v2 == set()
