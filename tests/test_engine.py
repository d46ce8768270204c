"""End-to-end engine tests on the synthetic token table (FIXTURES.md F1)."""

import pytest
from pyspark.sql import functions as F

from vldt_spark.flagship import TokenSequence, validate_token_table
from vldt_spark.sources.token_table import (
    sources_dim,
    token_sequences,
    token_sequences_ref,
)


@pytest.fixture(scope="module")
def toktab(spark):
    return token_sequences(spark, 5000, seed=42).cache()


def test_clean_table_all_valid(spark):
    clean = token_sequences(spark, 2000, seed=42, clean=True)
    res = validate_token_table(clean, sources_dim(spark))
    assert res.invalid.count() == 0


def test_flagship_finds_injected_violations(spark, toktab):
    res = validate_token_table(toktab, sources_dim(spark))
    viols = res.violations().cache()
    paths = {r["path"] for r in viols.select("path").distinct().collect()}
    # every injected violation class is detected
    assert "doc_id" in paths          # null / dup / regex
    assert "n_tok_matches" in paths   # cross-field
    assert "source" in paths          # RI
    assert any(p.startswith("tokens") for p in paths)  # out-of-vocab element
    # and the counts are in the injected ballpark (~0.1% each of 5000)
    n_invalid = res.invalid.count()
    assert 5 <= n_invalid <= 200


def test_violation_rates_match_injection(spark, toktab):
    res = validate_token_table(toktab, sources_dim(spark))
    v = res.violations()
    ri = v.filter(F.col("msg").contains("Referential integrity")).count()
    assert 1 <= ri <= 25  # ~0.1% of 5000 = 5 expected
    dup = v.filter(F.col("msg").contains("Duplicate value")).count()
    assert dup >= 2  # each dup key marks >= 2 rows


def test_verdicts_partitioned_by_source(spark, toktab):
    res = validate_token_table(toktab, sources_dim(spark))
    verd = res.verdicts(["source"]).collect()
    assert sum(r["n_rows"] for r in verd) == 5000
    assert all(r["n_invalid"] >= 0 for r in verd)
    by_src = {r["source"]: r for r in verd}
    assert "web" in by_src  # hot key present


def test_valid_rows_have_canonical_schema(spark, toktab):
    res = validate_token_table(toktab, sources_dim(spark))
    assert res.valid.columns == ["doc_id", "tokens", "n_tok", "source"]
    dtypes = dict(res.valid.dtypes)
    assert dtypes["tokens"] == "array<bigint>" or dtypes["tokens"] == "array<int>"
    assert dtypes["n_tok"] == "bigint"


def test_token_equality_invariant(spark):
    from vldt_spark.checks.rowinvariant import equality_report, token_equality_violations

    cur = token_sequences(spark, 4000, seed=42, clean=True)
    ref = token_sequences_ref(spark, 4000, seed=42)
    rep = equality_report(cur, ref).first()
    assert rep["n_checked"] == 4000
    assert rep["n_diff"] >= 1          # ~0.1% perturbed
    assert rep["n_equal"] + rep["n_diff"] + rep["n_missing_ref"] == 4000
    viols = token_equality_violations(cur, ref)
    assert viols.count() == rep["n_diff"] + rep["n_missing_ref"]


def test_generator_deterministic_across_parallelism(spark):
    a = token_sequences(spark, 1000, seed=7, partitions=2)
    b = token_sequences(spark, 1000, seed=7, partitions=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_async_validators(spark):
    """A21: async field/model validators — awaited batch-concurrently in
    the Arrow UDF (reference tests/test_async_validators.py semantics:
    same transform results as the sync path)."""
    import asyncio

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.model import Model
    from vldt_spark.validators import Mode, field_validator, model_validator

    class AsyncUser(Model):
        rid: int
        email: str = Field(regex=r"^[^@ ]+@[^@ ]+$")
        score: float

        @field_validator("email", mode=Mode.BEFORE)
        async def normalize_email(value):
            await asyncio.sleep(0)  # stands in for an external call
            return value.strip().lower() if value is not None else None

        @model_validator(mode=Mode.AFTER)
        async def boost(pdf):
            await asyncio.sleep(0)
            pdf["score"] = pdf["score"] * 2
            return pdf

    df = spark.createDataFrame(
        [(1, "  Alice@Example.COM ", 1.5), (2, "bad email", 2.0)],
        "rid long, email string, score double",
    )
    res = ValidationEngine(AsyncUser).run(df, id_cols=["rid"])
    rows = {r["rid"]: r for r in res.annotated.collect()}
    # BEFORE validator normalized the raw value, so the regex passes
    assert rows[1]["email"] == "alice@example.com" and rows[1]["is_valid"]
    assert not rows[2]["is_valid"]
    # AFTER model validator transformed the batch
    assert rows[1]["score"] == 3.0


def test_errors_json_reference_protocol(spark):
    """A16: the per-row error payload parses with the reference's
    conftest protocol — json.loads -> {path: msg | [msgs]}, repeated paths
    promoted to arrays."""
    import json

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.model import Model

    class M(Model):
        rid: int
        count: int = Field(ge=10, le=5)  # impossible range -> two violations
        name: str

    df = spark.createDataFrame(
        [(1, 7, None), (2, 12, "ok")], "rid long, count long, name string"
    )
    res = ValidationEngine(M).run(df, id_cols=["rid"])
    errs = {r["rid"]: json.loads(r["error"]) for r in res.errors_json().collect()}
    # row 1: count violates BOTH bounds (array promotion) + name missing
    assert isinstance(errs[1]["count"], list) and len(errs[1]["count"]) == 2
    assert errs[1]["name"] == "Expected type str, got NoneType"
    # row 2: single violation stays scalar
    assert errs[2]["count"] == "Value out of range: expected <= 5"


def test_annotate_projection_cache_same_results(spark):
    """Repeated annotate on same-shaped batches reuses the cached fused
    projection; results are identical and the cache is schema-keyed."""
    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.model import Model

    class M(Model):
        rid: int
        v: int = Field(ge=0)

    eng = ValidationEngine(M)
    a = spark.createDataFrame([(1, 5), (2, -1)], "rid long, v long")
    b = spark.createDataFrame([(3, -7)], "rid long, v long")
    r1 = eng.annotate(a)
    r2 = eng.annotate(b)
    # cache is weak-keyed by session, then by input schema
    assert len(eng._proj_cache) == 1  # one live session
    assert len(eng._proj_cache[spark]) == 1  # same schema -> one entry
    assert [r["rid"] for r in r2.where(~r2.is_valid).collect()] == [3]
    assert [r["rid"] for r in r1.where(~r1.is_valid).collect()] == [2]
    # a different schema (string v -> coercion path) gets its own entry
    c = spark.createDataFrame([(4, "8")], "rid long, v string")
    assert eng.annotate(c).first()["v"] == 8
    assert len(eng._proj_cache[spark]) == 2


def test_unique_together_composite(spark):
    """Model-level composite uniqueness: unique_together flags rows whose
    column TUPLE repeats, even when each column alone is non-unique."""
    from vldt_spark.engine import ValidationEngine
    from vldt_spark.model import Model

    class Pair(Model):
        rid: int
        a: int
        b: int

        unique_together = [("a", "b")]

    df = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 2), (3, 2, 1), (4, 1, 2)],  # (1,2) repeats
        "rid long, a long, b long",
    )
    res = ValidationEngine(Pair).run(df, id_cols=["rid"])
    bad = {r["rid"] for r in res.invalid.collect()}
    assert bad == {2, 4}
    v = res.violations().first()
    assert v["path"] == "a.b" and "unique fields (a, b)" in v["msg"]


def test_reserved_field_name_raises():
    import pytest

    from vldt_spark.model import Model

    with pytest.raises(TypeError, match="reserved"):
        class Bad(Model):
            rid: int
            violations: str
        Bad.__vldt_compile__()


def test_annotated_field_metadata_and_custom_deserializer(spark):
    """Annotated[T, Field(...)] metadata + ModelConfig custom deserializer
    (A26: reference Config(deserializer=...) custom-format parsing,
    tests/test_deserialization.py:38-44 -> d/M/yyyy dates)."""
    import datetime
    from typing import Annotated

    from pyspark.sql import functions as F

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.model import Model, ModelConfig

    class Event(Model):
        rid: int
        score: Annotated[int, Field(ge=0, le=100)]
        when: datetime.datetime

        vldt_config = ModelConfig(
            deserializers={"when": lambda c: F.try_to_timestamp(c, F.lit("d/M/yyyy"))}
        )

    df = spark.createDataFrame(
        [(1, 55, "14/3/2024"), (2, 200, "31/12/2023"), (3, 7, "not a date")],
        "rid long, score long, when string",
    )
    res = ValidationEngine(Event).run(df, id_cols=["rid"])
    rows = {r["rid"]: r for r in res.annotated.collect()}
    assert rows[1]["is_valid"]
    assert rows[1]["when"] == datetime.datetime(2024, 3, 14)
    # Annotated Field constraint applies: 200 > 100
    v = {(r["rid"], r["path"], r["msg"]) for r in res.violations().collect()}
    assert (2, "score", "Value out of range: expected <= 100") in v
    # custom-format parse failure -> violation, not a raise
    assert (3, "when", "Expected type datetime, got str") in v


def test_default_expr_per_row(spark):
    """Per-row expression defaults: the reference's default_factory makes a
    fresh value per instance (random session ids, tests/test_fields.py:
    83-102); the engine analogue is a deterministic per-row expression."""
    from pyspark.sql import functions as F

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.model import Model

    class Sess(Model):
        rid: int
        session_id: str = Field(
            default_expr=lambda: F.sha2(F.col("rid").cast("string"), 256)
        )

    df = spark.createDataFrame(
        [(1, None), (2, "explicit"), (3, None)], "rid long, session_id string"
    )
    rows = {r["rid"]: r["session_id"]
            for r in ValidationEngine(Sess).annotate(df).collect()}
    assert rows[2] == "explicit"  # provided value wins over the default
    assert rows[1] != rows[3] and len(rows[1]) == 64  # fresh per row
    # deterministic: re-running yields identical ids (resume-safe)
    again = {r["rid"]: r["session_id"]
             for r in ValidationEngine(Sess).annotate(df).collect()}
    assert again == rows


def test_result_profile_of_valid_rows(spark, toktab):
    from vldt_spark.flagship import validate_token_table

    res = validate_token_table(toktab)
    prof = {r["column"]: r for r in res.profile(["n_tok", "doc_id"]).collect()}
    assert prof["n_tok"]["n_null"] == 0  # invalid rows excluded
    assert prof["n_tok"]["mean"] is not None
    assert prof["doc_id"]["mean"] is None  # non-numeric: stats only


def test_async_model_level_parity(spark):
    """A21 model-level parity with the reference's AsyncDataModel protocol
    (/root/reference/vldt/models.py:163-269, tests/test_async_validators.py):
    async model BEFORE mutates the raw kwargs -> sync validation/coercion ->
    async field AFTER -> async model AFTER mutates the validated instance.
    Stage ordering is pinned by NON-COMMUTING transforms, and an invalid
    value surviving BEFORE propagates as a violation row with field
    lineage (the engine's analogue of the awaited TypeError)."""
    import asyncio

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.model import Model
    from vldt_spark.validators import Mode, field_validator, model_validator

    class AsyncOrder(Model):
        rid: int
        total: float = Field(gt=0.0)

        # async model BEFORE: operates on RAW values (string dollar
        # amounts) — coercion str->float can only succeed if this ran first
        @model_validator(mode=Mode.BEFORE)
        async def strip_currency(pdf):
            await asyncio.sleep(0)
            pdf["total"] = pdf["total"].str.replace("$", "", regex=False).str.strip()
            return pdf

        # async field AFTER: runs on the VALIDATED double
        @field_validator("total", mode=Mode.AFTER)
        async def add_fee(value):
            await asyncio.sleep(0)
            return value + 0.0001 if value is not None else None

        # async model AFTER: runs LAST (reference AsyncOrder.adjust_order
        # rounds the total after init) — round(123.4567 + 0.0001, 2) ==
        # 123.46 only if add_fee already ran; the reverse order would give
        # 123.4601 in the output
        @model_validator(mode=Mode.AFTER)
        async def round_total(pdf):
            await asyncio.sleep(0)
            pdf["total"] = pdf["total"].round(2)
            return pdf

    df = spark.createDataFrame(
        [(1, " $123.4567 "), (2, "$-5.00"), (3, "$abc")],
        "rid long, total string",
    )
    res = ValidationEngine(AsyncOrder).run(df, id_cols=["rid"])
    rows = {r["rid"]: r for r in res.annotated.collect()}
    # happy path: BEFORE stripped '$', coercion cast, field AFTER added the
    # fee, model AFTER rounded — exactly the reference's staged pipeline
    assert rows[1]["is_valid"] and rows[1]["total"] == 123.46
    # error propagation: value passed BEFORE but failed the gt constraint
    viols = {r["rid"]: (r["path"], r["msg"]) for r in res.violations().collect()}
    assert not rows[2]["is_valid"] and viols[2][0] == "total"
    # un-coercible after BEFORE -> coercion violation with field lineage
    assert not rows[3]["is_valid"] and viols[3][0] == "total"
    assert rows[3]["total"] is None


def test_violations_sample_bounded_and_deterministic(spark, toktab):
    res = validate_token_table(toktab, sources_dim(spark))
    sample = res.violations_sample(k=3)
    rows = sample.collect()
    assert rows, "dirty fixture must produce violations"
    per_group: dict = {}
    for r in rows:
        per_group.setdefault((r["path"], r["msg"]), []).append(r)
    for grp, rs in per_group.items():
        assert len(rs) <= 3, grp
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
    # deterministic: a second run returns the identical sample
    again = {tuple(r) for r in res.violations_sample(k=3).collect()}
    assert again == {tuple(r) for r in rows}
    # every sampled group exists in the full violation stream with >= as many rows
    full = {
        (r["path"], r["msg"]): r["n"]
        for r in res.violations()
        .groupBy("path", "msg")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for grp, rs in per_group.items():
        assert full[grp] >= len(rs)


def test_violations_sample_uses_window_group_limit(spark, toktab):
    # the rank<=k filter must push as a group-limit BEFORE the exchange,
    # so partitions never ship their full violation stream
    res = validate_token_table(toktab, sources_dim(spark))
    plan = (
        res.violations_sample(k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
