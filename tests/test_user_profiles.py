"""F2 fixture — nested user-profile model mirroring the reference load test
(/root/reference/load_test/vldt_model_user.py:37-60): nested structs,
arrays, maps, Optional, datetime coercion, defaults — validated as one
fused pass over a synthesized DataFrame."""

import datetime
from typing import Dict, List, Optional

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vldt_spark.engine import ValidationEngine
from vldt_spark.fields import Field
from vldt_spark.model import Model
from vldt_spark.validators import check


class Address(Model):
    street: str
    city: str
    postal_code: str


class Company(Model):
    name: str
    industry: str
    employees: int = Field(ge=1)


class Profile(Model):
    username: str
    email: str = Field(regex=r"^[^@]+@[^@]+\.[^@]+$")
    bio: Optional[str]
    website: Optional[str]


class BankAccount(Model):
    account_number: str
    balance: float = Field(ge=0)
    transactions: List[Dict[str, float]]


class UserProfile(Model):
    """21-field model (vldt_model_user.py:37-60 analogue)."""

    id: int
    name: str
    age: int = Field(ge=18)  # validator rule, tests/test_validators.py:19-44
    is_active: bool
    registered_at: datetime.datetime  # ISO string → timestamp coercion (A26)
    address: Address
    company: Company
    profile: Profile
    bank_account: BankAccount
    scores: List[int]
    attributes: Dict[str, str]
    security_level: int = Field(default=1)
    friends: List[str]
    metadata: Dict[str, Dict[str, str]]
    tags: List[str]
    rating: float
    phone_number: Optional[str]
    additional_info: Dict[str, str]
    bonus: Optional[float]
    score_multiplier: float = 1.0
    level: int = Field(ge=0, le=100)

    @check("rating_range", message="Check failed: rating must be in [0, 5]")
    def rating_range(cols):
        return (cols.rating >= 0) & (cols.rating <= 5)


SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("age", T.StringType()),  # strings → int coercion path
    T.StructField("is_active", T.BooleanType()),
    T.StructField("registered_at", T.StringType()),  # ISO-8601 strings
    T.StructField("address", T.StructType([
        T.StructField("street", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("postal_code", T.StringType()),
    ])),
    T.StructField("company", T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("industry", T.StringType()),
        T.StructField("employees", T.LongType()),
    ])),
    T.StructField("profile", T.StructType([
        T.StructField("username", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("bio", T.StringType()),
        T.StructField("website", T.StringType()),
    ])),
    T.StructField("bank_account", T.StructType([
        T.StructField("account_number", T.StringType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("transactions", T.ArrayType(T.MapType(T.StringType(), T.DoubleType()))),
    ])),
    T.StructField("scores", T.ArrayType(T.LongType())),
    T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
    T.StructField("friends", T.ArrayType(T.StringType())),
    T.StructField("metadata", T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType()))),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("rating", T.DoubleType()),
    T.StructField("phone_number", T.StringType()),
    T.StructField("additional_info", T.MapType(T.StringType(), T.StringType())),
    T.StructField("bonus", T.DoubleType()),
    T.StructField("level", T.LongType()),
])


def good_row(i=1):
    return (
        i, f"User {i}", "30", True, "2024-03-14T12:00:00",
        {"street": "1 Main St", "city": "Springfield", "postal_code": "12345"},
        {"name": "Acme", "industry": "tools", "employees": 100},
        {"username": f"user{i}", "email": f"u{i}@example.com", "bio": None, "website": None},
        {"account_number": "ACC-001", "balance": 250.5,
         "transactions": [{"deposit": 100.0}, {"withdrawal": 25.0}]},
        [90, 85, 77], {"height": "180"}, ["a", "b"],
        {"prefs": {"theme": "dark"}}, ["vip"], 4.5, None,
        {"note": "x"}, None, 42,
    )


@pytest.fixture(scope="module")
def users(spark):
    bad_age = list(good_row(2)); bad_age[2] = "thirty"            # wrong-typed age
    minor = list(good_row(3)); minor[2] = "15"                     # age < 18
    neg_balance = list(good_row(4))
    neg_balance[8] = {**good_row(4)[8], "balance": -10.0}          # negative balance
    bad_email = list(good_row(5))
    bad_email[7] = {**good_row(5)[7], "email": "not-an-email"}
    bad_rating = list(good_row(6)); bad_rating[14] = 9.5           # cross-field fail
    rows = [good_row(1), tuple(bad_age), tuple(minor), tuple(neg_balance),
            tuple(bad_email), tuple(bad_rating)]
    return spark.createDataFrame(rows, SCHEMA)


def test_user_profiles_validation(spark, users):
    res = ValidationEngine(UserProfile).run(users, id_cols=["id"])
    by_id = {r["id"]: r for r in res.annotated.collect()}
    assert by_id[1]["is_valid"]
    viol = {r["id"]: (r["path"], r["msg"]) for r in res.violations().collect()}
    assert viol[2] == ("age", "Expected type int, got str")
    assert viol[3] == ("age", "Value out of range: expected >= 18")
    assert viol[4] == ("bank_account.balance", "Value out of range: expected >= 0")
    assert viol[5][0] == "profile.email"
    assert viol[6] == ("rating_range", "Check failed: rating must be in [0, 5]")


def test_user_profiles_coercion_and_defaults(spark, users):
    res = ValidationEngine(UserProfile).run(users, id_cols=["id"])
    row = res.valid.first()
    assert row["age"] == 30                        # "30" → 30
    assert row["security_level"] == 1              # Field(default=1) filled
    assert row["score_multiplier"] == 1.0          # plain class attr default
    assert isinstance(row["registered_at"], datetime.datetime)  # ISO → timestamp
    assert row["registered_at"].year == 2024
    # canonical schema order (to_dict schema-ordered, dict_utils.cpp:221-240)
    assert res.valid.columns[:5] == ["id", "name", "age", "is_active", "registered_at"]


def test_user_profiles_json_roundtrip(spark, users):
    """A23/A25: to_json → from_json round-trip preserves valid rows."""
    from vldt_spark.sources.readers import read_json_validated, to_json_rows

    res = ValidationEngine(UserProfile).run(users, id_cols=["id"])
    js = to_json_rows(res.valid)
    back = read_json_validated(spark, js, UserProfile)
    res2 = ValidationEngine(UserProfile).run(back.drop("_corrupt_record"), id_cols=["id"])
    assert res2.invalid.count() == 0
    assert res2.valid.count() == res.valid.count()


def test_corrupt_json_becomes_violation(spark):
    from vldt_spark.sources.readers import read_json_validated

    raw = spark.createDataFrame([('{"id": 7, "name": "ok"',), ('{"id": 8}',)], "js string")
    parsed = read_json_validated(spark, raw, UserProfile)
    rows = parsed.select("id", "_corrupt_record").collect()
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1  # malformed row → violation, not an exception


def test_to_json_custom_serializer_hook(spark):
    """A25/A23: the per-column serializer hook is consulted before the
    default encoding (reference Config(json_serializer={type: fn}),
    json_utils.cpp:53-148) — here a date-format override."""
    import json

    from pyspark.sql import functions as F

    from vldt_spark.sources.readers import to_json_rows

    df = spark.createDataFrame(
        [(1, "2024-03-14 15:09:26")], "rid long, registered_at string"
    ).withColumn("registered_at", F.to_timestamp("registered_at"))
    js = to_json_rows(
        df,
        serializers={"registered_at": lambda c: F.date_format(c, "yyyy/MM/dd")},
    )
    out = json.loads(js.first()["json"])
    assert out == {"rid": 1, "registered_at": "2024/03/14"}


def test_nested_model_end_to_end_quarantine(spark, users, tmp_path):
    """Integration: nested-model validation -> reference-protocol error
    JSON -> quarantine sink, over the F2 user-profiles fixture."""
    import json

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.sources.quarantine import reconcile, write_quarantined

    res = ValidationEngine(UserProfile).run(users, id_cols=["id"])
    errs = {r["id"]: json.loads(r["error"]) for r in res.errors_json().collect()}
    assert errs  # the fixture injects invalid rows
    # dotted nested paths appear in the reference-protocol payload
    assert any("." in k for e in errs.values() for k in e)

    root = str(tmp_path / "q")
    stats = write_quarantined(res, root)
    assert stats["n_quarantined"] == len(errs)
    assert reconcile(spark, root, users.count())
