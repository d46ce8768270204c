"""Union-of-models ordered resolution (A14 hard part — reference
tests/test_vldt.py:786-818: candidates probed in declared order, first
success wins, so declaration order changes which model claims an input
that satisfies both). Output is the TYPED variant struct
``struct<__variant, as_<Model>...>`` — winner fields selectable without
re-parsing."""

from typing import Union

from pyspark.sql import types as T

from vldt_spark.engine import ValidationEngine
from vldt_spark.model import Model


class Cat(Model):
    name: str
    meows: int


class Dog(Model):
    name: str
    barks: int


class PetHolderCatFirst(Model):
    hid: int
    pet: Union[Cat, Dog]


class PetHolderDogFirst(Model):
    hid: int
    pet: Union[Dog, Cat]


SCHEMA = T.StructType([
    T.StructField("hid", T.LongType()),
    T.StructField("pet", T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("meows", T.LongType()),
        T.StructField("barks", T.LongType()),
    ])),
])


def _variants(spark, model, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = ValidationEngine(model).annotate(df).orderBy("hid").collect()
    res = []
    for r in out:
        v = r["pet"]["__variant"] if r["pet"] is not None else None
        res.append((v, r["is_valid"]))
    return res


def test_union_of_models_declared_order(spark):
    rows = [
        (1, {"name": "a", "meows": 3, "barks": None}),   # only Cat matches
        (2, {"name": "b", "meows": None, "barks": 2}),   # only Dog matches
        (3, {"name": "c", "meows": 1, "barks": 1}),      # BOTH match → order decides
        (4, {"name": "d", "meows": None, "barks": None}),  # neither → violation
    ]
    cat_first = _variants(spark, PetHolderCatFirst, rows)
    assert cat_first[0] == ("Cat", True)
    assert cat_first[1] == ("Dog", True)
    assert cat_first[2][0] == "Cat"          # declared order: Cat wins
    assert cat_first[3][1] is False          # no candidate → invalid

    dog_first = _variants(spark, PetHolderDogFirst, rows)
    assert dog_first[2][0] == "Dog"          # reversed declaration flips it


def test_union_of_models_violation_message(spark):
    df = spark.createDataFrame(
        [(9, {"name": "x", "meows": None, "barks": None})], SCHEMA
    )
    res = ValidationEngine(PetHolderCatFirst).run(df, id_cols=["hid"])
    v = res.violations().first()
    assert v["path"] == "pet"
    assert v["msg"] == "Expected type Cat | Dog, got dict"


def test_union_of_models_typed_struct_output(spark):
    """The variant struct is TYPED: exactly one as_<Model> branch is
    populated with the winner's coerced fields; the loser branch is null;
    winner fields are selected columnar (no JSON re-parse)."""
    from pyspark.sql import functions as F

    rows = [
        (1, {"name": "a", "meows": 3, "barks": None}),
        (2, {"name": "b", "meows": None, "barks": 2}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    ann = ValidationEngine(PetHolderCatFirst).annotate(df)
    # output dtype is the declared struct, not a string
    dt = dict(zip(ann.schema.names, [f.dataType for f in ann.schema.fields]))["pet"]
    assert [f.name for f in dt.fields] == ["__variant", "as_Cat", "as_Dog"]
    got = {
        r["hid"]: r
        for r in ann.select(
            "hid",
            F.col("pet.__variant").alias("v"),
            F.col("pet.as_Cat.meows").alias("meows"),
            F.col("pet.as_Dog.barks").alias("barks"),
            F.col("pet.as_Cat").alias("cat"),
            F.col("pet.as_Dog").alias("dog"),
        ).collect()
    }
    assert got[1]["v"] == "Cat" and got[1]["meows"] == 3 and got[1]["dog"] is None
    assert got[2]["v"] == "Dog" and got[2]["barks"] == 2 and got[2]["cat"] is None


def test_mixed_union_model_and_scalar(spark):
    """Union[Model, int]: scalar sources resolve through the typed scalar
    arm (as_int), struct sources through the model arm — previously scalar
    arms were dropped from the variant struct and a scalar source crashed
    at plan time (AnalysisException casting BIGINT to STRUCT)."""
    from typing import Union

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.model import Model

    class MxArticle(Model):
        title: str = Field(not_null=True)
        words: int

    globals()["MxArticle"] = MxArticle

    class MxDoc(Model):
        rid: int
        payload: Union[MxArticle, int]

    globals()["MxDoc"] = MxDoc

    # scalar source
    df = spark.createDataFrame([(1, 42)], "rid int, payload long")
    row = ValidationEngine(MxDoc).run(df, id_cols=["rid"]).annotated.first()
    assert row["payload"]["__variant"] == "int"
    assert row["payload"]["as_int"] == 42
    assert row["payload"]["as_MxArticle"] is None
    assert row["is_valid"] is True

    # struct source: the model arm wins, scalar arm stays null
    df2 = spark.createDataFrame(
        [(2, ("hi", 3))], "rid int, payload struct<title:string, words:long>"
    )
    row2 = ValidationEngine(MxDoc).run(df2, id_cols=["rid"]).annotated.first()
    assert row2["payload"]["__variant"] == "MxArticle"
    assert row2["payload"]["as_MxArticle"]["title"] == "hi"
    assert row2["payload"]["as_int"] is None

    # unresolvable scalar -> violation naming every declared branch
    df3 = spark.createDataFrame([(3, "nope")], "rid int, payload string")
    v = ValidationEngine(MxDoc).run(df3, id_cols=["rid"]).violations().first()
    assert v["path"] == "payload" and "MxArticle | int" in v["msg"]


def test_union_duplicate_arm_names_rejected(spark):
    """Two non-model branches with the same type name (e.g. two list
    arms) would collide on one as_list slot — rejected at compile time
    with guidance instead of an ambiguous struct."""
    from typing import List, Union

    import pytest as _pytest

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.model import Model

    class DupArticle(Model):
        title: str

    globals()["DupArticle"] = DupArticle

    class DupDoc(Model):
        rid: int
        payload: Union[DupArticle, List[int], List[str]]

    globals()["DupDoc"] = DupDoc

    df = spark.createDataFrame([(1, [1, 2])], "rid int, payload array<long>")
    with _pytest.raises(ValueError, match="distinct variant slots"):
        ValidationEngine(DupDoc).run(df, id_cols=["rid"])


def test_mixed_union_complex_source_violates_not_crashes(spark):
    """An array/map source against Union[Model, int] yields a violation
    row — scalar arms only match atomic sources (try_cast(array->bigint)
    is a plan-time AnalysisException otherwise; try_cast(map->string)
    would silently stringify)."""
    from typing import Union

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.model import Model

    class CxArticle(Model):
        title: str

    globals()["CxArticle"] = CxArticle

    class CxDoc(Model):
        rid: int
        payload: Union[CxArticle, int]

    globals()["CxDoc"] = CxDoc

    df = spark.createDataFrame([(1, [1, 2])], "rid int, payload array<long>")
    res = ValidationEngine(CxDoc).run(df, id_cols=["rid"])
    v = res.violations().first()
    assert v["path"] == "payload"
    assert "Expected type CxArticle | int, got list" in v["msg"]
