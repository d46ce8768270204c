"""Bounded-depth self-recursive models (ModelConfig.max_recursion_depth).

The reference admits cyclic models per-object via forward-ref resolution
(/root/reference/vldt/models.py:27-36, tests/test_vldt.py:504-527); a Spark
StructType is a finite tree, so the repo unrolls a DIRECT self-reference
``d`` levels — each level a synthesized nested model class with the full
coercion/lineage machinery — and reports data nested deeper than ``d`` as a
violation row at the exact cutoff path, never a silent drop. The default
(d=0) keeps rejecting cycles at compile time, as does mutual recursion.
"""

from typing import List, Optional

import pytest

from vldt_spark import validate
from vldt_spark.model import Model, ModelConfig


class Thread(Model):
    vldt_config = ModelConfig(max_recursion_depth=2)
    id: int
    note: Optional[str]
    reply: Optional["Thread"]


class Category(Model):
    vldt_config = ModelConfig(max_recursion_depth=1)
    name: str
    subcats: Optional[List["Category"]]


class ThreadWrap(Model):
    rid: int
    thread: Optional[Thread]


class CatWrap(Model):
    rid: int
    cat: Optional[Category]


def test_schema_unrolls_declared_depth_and_caches():
    st = Thread.spark_schema()
    # d=2 -> root + two nested reply levels, innermost has no reply field
    assert st.simpleString() == (
        "struct<id:bigint,note:string,reply:struct<id:bigint,note:string,"
        "reply:struct<id:bigint,note:string>>>"
    )
    assert Thread.__vldt_compile__() is Thread.__vldt_compile__()
    assert Thread.spark_schema() == st
    # per-depth synthesized classes are cached on the root, one per level
    assert sorted(Thread.__vldt_depth_classes__) == [0, 1]
    inner = Thread.__vldt_depth_classes__[0].__vldt_compile__()
    assert inner.pruned_fields == ["reply"]
    # root and mid levels prune nothing
    assert Thread.__vldt_compile__().pruned_fields == []


def test_deeper_data_becomes_violation_at_cutoff_path(spark):
    rows = [
        (1, {"id": 10, "note": "a", "reply": None}),
        (2, {"id": 20, "note": "b",
             "reply": {"id": 21, "note": "c",
                       "reply": {"id": 22, "note": "d", "reply": None}}}),
        (3, {"id": 30, "note": "e",
             "reply": {"id": 31, "note": "f",
                       "reply": {"id": 32, "note": "g",
                                 "reply": {"id": 33, "note": "h",
                                           "reply": None}}}}),
        (4, None),
    ]
    src = (
        "rid long, thread struct<id:long, note:string, reply:struct<"
        "id:long, note:string, reply:struct<id:long, note:string, "
        "reply:struct<id:long, note:string, reply:string>>>>"
    )
    res = validate(spark.createDataFrame(rows, src), ThreadWrap, id_cols=["rid"])
    viols = [(r["rid"], r["path"], r["msg"]) for r in res.violations().collect()]
    assert viols == [
        (3, "thread.reply.reply.reply",
         "Exceeded max recursion depth for model Thread"),
    ]
    flags = {r["rid"]: r["is_valid"] for r in res.annotated.collect()}
    assert flags == {1: True, 2: True, 3: False, 4: True}
    # the coerced output is the truncated (in-budget) prefix of the tree
    deep = res.annotated.where("rid = 3").first()["thread"]
    assert deep["reply"]["reply"]["id"] == 32
    assert "reply" not in deep["reply"]["reply"].asDict()


def test_list_recursion_empty_at_cutoff_is_clean(spark):
    rows = [
        (1, {"name": "a", "subcats": [{"name": "a1", "subcats": []}]}),
        (2, {"name": "b", "subcats": [
            {"name": "b1", "subcats": [{"name": "b2", "subcats": None}]}]}),
    ]
    src = (
        "rid long, cat struct<name:string, subcats:array<struct<name:string,"
        " subcats:array<struct<name:string, subcats:string>>>>>"
    )
    res = validate(spark.createDataFrame(rows, src), CatWrap, id_cols=["rid"])
    viols = [(r["rid"], r["path"], r["msg"]) for r in res.violations().collect()]
    # an EMPTY list at the cutoff is a legal terminator; content is not,
    # and the indexed lineage survives through the array
    assert viols == [
        (2, "cat.subcats.0.subcats",
         "Exceeded max recursion depth for model Category"),
    ]


def test_field_constraints_apply_at_synthesized_depths(spark):
    from vldt_spark.fields import Field

    class Chain(Model):
        vldt_config = ModelConfig(max_recursion_depth=1)
        v: int = Field(ge=0)
        nxt: Optional["Chain"]

    globals()["Chain"] = Chain

    class ChainWrap(Model):
        rid: int
        head: Optional[Chain]

    globals()["ChainWrap"] = ChainWrap
    rows = [(1, {"v": 5, "nxt": {"v": -2, "nxt": None}})]
    src = "rid long, head struct<v:long, nxt:struct<v:long, nxt:string>>"
    res = validate(spark.createDataFrame(rows, src), ChainWrap, id_cols=["rid"])
    viols = [(r["path"], r["msg"]) for r in res.violations().collect()]
    assert viols == [("head.nxt.v", "Value out of range: expected >= 0")]


def test_default_depth_zero_still_rejects_with_guidance():
    class Loop(Model):
        v: int
        nxt: Optional["Loop"]

    globals()["Loop"] = Loop
    with pytest.raises(TypeError, match="Recursive model reference"):
        Loop.__vldt_compile__()
    with pytest.raises(TypeError, match="max_recursion_depth"):
        Loop.__vldt_compile__()


def test_mutual_recursion_still_rejected():
    class MutA(Model):
        vldt_config = ModelConfig(max_recursion_depth=3)
        x: int
        b: Optional["MutB"]

    class MutB(Model):
        y: int
        a: Optional[MutA]

    globals()["MutA"] = MutA
    globals()["MutB"] = MutB
    with pytest.raises(TypeError, match="Recursive model reference"):
        MutA.__vldt_compile__()
