"""B13 checkpoint/resume + streaming validation regression tests."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from vldt_spark.flagship import TokenSequence
from vldt_spark.plans.ledger import ValidationLedger
from vldt_spark.sources.token_table import sources_dim, token_sequences


@pytest.fixture()
def ledger_root(tmp_path):
    return str(tmp_path / "ledger")


def test_ledger_resume_idempotent(spark, ledger_root):
    led = ValidationLedger(ledger_root, "source")
    toks = token_sequences(spark, 2000, seed=42)
    dims = {"sources": sources_dim(spark)}

    m1 = led.run(toks, TokenSequence, id_cols=["doc_id"], dims=dims)
    assert len(m1) >= 5  # one per source value present

    # simulate a crash after one partition's marker was lost
    os.remove(os.path.join(ledger_root, "_ledger", "part=web.json"))
    m2 = led.run(toks, TokenSequence, id_cols=["doc_id"], dims=dims)
    assert sorted(m2.keys()) == ["web"]  # ONLY the un-committed partition re-ran

    m3 = led.run(toks, TokenSequence, id_cols=["doc_id"], dims=dims)
    assert m3 == {}  # everything committed → no work

    # metrics/violations tables readable and consistent
    metrics = led.metrics(spark)
    assert metrics.count() == len(m1)
    total = sum(m["n_rows"] for m in m1.values())
    assert toks.where(F.col("source").isNotNull()).count() == total


def test_ledger_marker_written_last(spark, ledger_root):
    """The commit marker is the publish step: a partition with data files
    but no marker is treated as incomplete and re-run (write-audit-publish)."""
    led = ValidationLedger(ledger_root, "source")
    toks = token_sequences(spark, 1000, seed=7)
    led.run(toks, TokenSequence, id_cols=["doc_id"])
    assert "web" in led.completed_partitions()
    # wipe only the marker, keep parquet output → partition must re-run
    os.remove(os.path.join(ledger_root, "_ledger", "part=web.json"))
    assert "web" not in led.completed_partitions()


def test_streaming_matches_batch(spark, tmp_path):
    """The fused validation projection is stateless → streaming totals
    must equal the batch run on the same data."""
    from vldt_spark.streaming import validated_stream, windowed_violation_counts
    from vldt_spark.engine import ValidationEngine

    src = str(tmp_path / "stream_src")
    toks = token_sequences(spark, 3000, seed=42).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.xxhash64("doc_id"), F.lit(1800))),
    )
    toks.write.parquet(src)

    out = windowed_violation_counts(
        spark, src, TokenSequence, ts_col="ts", window="10 minutes",
        query_name="vldt_test_stream",
    )
    stream_totals = out.agg(
        F.sum("n_rows").alias("r"), F.sum("n_invalid").alias("i")
    ).first()

    batch = ValidationEngine(TokenSequence).annotate(spark.read.parquet(src), keep_extra=True)
    batch_invalid = batch.filter(~F.col("is_valid")).count()
    assert stream_totals["r"] == 3000
    assert stream_totals["i"] == batch_invalid


def test_quarantine_sink_routes_and_reconciles(spark, tmp_path):
    """Valid rows -> data/, invalid rows + violation lineage -> quarantine/;
    counts reconcile with the input (write-audit-publish)."""
    import json

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.sources.quarantine import reconcile, write_quarantined

    toks = token_sequences(spark, 3000, seed=42)
    res = ValidationEngine(TokenSequence).run(toks, id_cols=["doc_id"])
    root = str(tmp_path / "q")
    stats = write_quarantined(res, root, partition_col="source")
    assert stats["n_valid"] > 0 and stats["n_quarantined"] > 0
    assert reconcile(spark, root, toks.count())
    # quarantined rows carry parseable violation lineage + original values
    q = spark.read.parquet(root + "/quarantine")
    row = q.first()
    v = json.loads(row["violations_json"])
    assert v and all("path" in e and "msg" in e for e in v)
    assert "tokens" in q.columns and "doc_id" in q.columns
