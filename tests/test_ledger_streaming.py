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


def test_streaming_drift_monitor(spark, tmp_path):
    """Per-window streaming PSI: a clean-day window scores low, a shifted-
    distribution day scores high — matching the batch PSI semantics."""
    from vldt_spark.checks.drift import histogram, psi
    from vldt_spark.streaming.drift_stream import run_drift_monitor

    src = str(tmp_path / "drift_src")
    # day 1: values uniform 0..99 (same as reference); day 2: shifted +50
    day1 = spark.range(5000).select(
        F.lit("2026-01-01 10:00:00").cast("timestamp").alias("ts"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    day2 = spark.range(5000).select(
        F.lit("2026-01-02 10:00:00").cast("timestamp").alias("ts"),
        ((F.col("id") % 100) * 0.5 + 50).cast("double").alias("v"),
    )
    day1.unionByName(day2).coalesce(2).write.parquet(src)

    ref = spark.range(20000).select((F.col("id") % 100).cast("double").alias("v"))
    ref_hist = histogram(ref, "v", bins=10, lo=0.0, hi=100.0)

    q = run_drift_monitor(
        spark, src, ref_hist, "v", "ts", bins=10, lo=0.0, hi=100.0,
        window="1 day", query_name="t_drift_stream",
    )
    # append mode: windows emit once the watermark passes their end —
    # advance it with two later sentinel batches appended to the source
    for day in ["2026-01-05", "2026-01-06"]:
        spark.range(1).select(
            F.lit(day + " 10:00:00").cast("timestamp").alias("ts"),
            F.lit(1.0).alias("v"),
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    q.stop()
    rows = {str(r["window_start"])[:10]: r["psi"] for r in spark.table("t_drift_stream").collect()}
    assert rows["2026-01-01"] < 1e-6  # identical distribution
    assert rows["2026-01-02"] > 0.1  # shifted -> drifted

    # per-window streaming PSI == the batch psi() on the same slice
    batch_psi = psi(ref_hist, histogram(day2, "v", bins=10, lo=0.0, hi=100.0))
    assert abs(rows["2026-01-02"] - round(batch_psi, 6)) < 1e-4


def test_stream_job_resumes_exactly_once(spark, tmp_path):
    """Kill-and-resubmit semantics: a second --once run with the same
    checkpoint processes ONLY files that arrived after the first run —
    no double-counting in either sink."""
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.submit_stream import main as stream_main

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    token_sequences(spark, 2000, seed=42).coalesce(1).write.parquet(src)
    assert stream_main(["--input", src, "--output", out, "--once"]) == 0
    v1 = spark.read.parquet(out + "/verdicts")
    total1 = v1.agg(F.sum("n_rows")).first()[0]
    assert total1 == 2000

    # new data arrives; resubmit with the same checkpoint
    token_sequences(spark, 500, seed=7).coalesce(1).write.mode("append").parquet(src)
    assert stream_main(["--input", src, "--output", out, "--once"]) == 0
    v2 = spark.read.parquet(out + "/verdicts")
    assert v2.agg(F.sum("n_rows")).first()[0] == 2500  # 2000 + 500, not 4500
    assert v2.select("batch_id").distinct().count() == 2


def test_build_corpus_pipeline(spark, tmp_path):
    """End-to-end corpus build: validate -> dedup -> quality -> domain cap;
    funnel counts are monotone and the cap binds."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.build_corpus import main as corpus_main

    src = str(tmp_path / "docs")
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base.write.parquet(src)
    out = str(tmp_path / "corpus")
    assert corpus_main([
        "--input", src, "--output", out,
        "--quality", "0.2", "--cap-per-source", "3", "--jaccard", "0.5",
    ]) == 0
    rep = json.load(open(out + "/funnel.json"))
    assert rep["n_input"] == rep["n_valid"] + rep["n_quarantined"]
    assert (rep["n_valid"] >= rep["n_after_exact_dedup"]
            >= rep["n_after_near_dedup"] >= rep["n_after_quality"]
            >= rep["n_final"])
    # the per-source cap binds at 3
    per_src = spark.read.parquet(out + "/corpus").groupBy("source").count().collect()
    assert per_src and all(r["count"] <= 3 for r in per_src)
    # every funnel stage is materialized (one pass per stage, never a
    # recompute of the dedup chain for a count) and matches the report
    import os as _os

    for stage, key in [("exact", "n_after_exact_dedup"),
                       ("near", "n_after_near_dedup"),
                       ("quality", "n_after_quality")]:
        p = _os.path.join(out, "stages", stage)
        assert _os.path.isdir(p), p
        assert spark.read.parquet(p).count() == rep[key]
    # every surviving row got a split; packing layout covers the train split
    corpus = spark.read.parquet(out + "/corpus")
    assert corpus.where(F.col("split").isNull()).count() == 0
    assert rep["n_final"] == sum(rep["split_counts"].values())
    n_train = rep["split_counts"].get("train", 0)
    layout = spark.read.parquet(out + "/stages/layout")
    assert layout.count() == n_train  # one placement row per train doc
    assert rep["n_train_packs"] >= 1


def test_build_corpus_decontaminates_against_benchmark(spark, tmp_path):
    """--benchmark drops every doc sharing a 13-gram with the eval set —
    including the benchmark docs themselves when they appear verbatim."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.build_corpus import main as corpus_main

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs")
    base.write.parquet(src)
    bench_dir = str(tmp_path / "bench")
    base.where(F.col("doc_id") % 41 == 0).select("text").write.parquet(bench_dir)
    out = str(tmp_path / "corpus_dec")
    assert corpus_main([
        "--input", src, "--output", out, "--quality", "0.0",
        "--cap-per-source", "10000", "--benchmark", bench_dir,
        "--pack-tokens", "0",
    ]) == 0
    rep = json.load(open(out + "/funnel.json"))
    assert rep["n_after_decontamination"] < rep["n_after_quality"]
    assert rep["n_train_packs"] is None  # --pack-tokens 0 skips the stage
    # no surviving doc is one of the benchmark ids
    survivors = {r["doc_id"] for r in spark.read.parquet(out + "/corpus").collect()}
    assert not any(d % 41 == 0 for d in survivors)


def test_submit_validation_job_resumes(spark, tmp_path, capsys):
    """Job-level resume: a second submission with the same ledger output
    skips every completed partition."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.submit_validation import main as validate_main

    out = str(tmp_path / "run")
    assert validate_main(["--synthetic", "5000", "--output", out]) == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["n_rows"] == 5000 and rep1["partitions_run"]

    assert validate_main(["--synthetic", "5000", "--output", out]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["partitions_run"] == []  # everything committed -> no work
    assert sorted(rep2["partitions_skipped"]) == sorted(rep1["partitions_run"])


def test_streaming_psi_by_group(spark, tmp_path):
    """Per-(window, group) streaming PSI: within one day-window, the clean
    group scores ~0 and the shifted group high — matching the batch
    psi_by_group semantics with the group key carried through both
    stateful aggregation stages."""
    import uuid

    from vldt_spark.checks.drift import histogram, psi
    from vldt_spark.streaming.drift_stream import stream_psi_by_group

    src = str(tmp_path / "drift_grp_src")
    clean = spark.range(4000).select(
        F.lit("2026-02-01 10:00:00").cast("timestamp").alias("ts"),
        F.lit("clean").alias("grp"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    shifted = spark.range(4000).select(
        F.lit("2026-02-01 11:00:00").cast("timestamp").alias("ts"),
        F.lit("shifted").alias("grp"),
        ((F.col("id") % 100) * 0.5 + 50).cast("double").alias("v"),
    )
    clean.unionByName(shifted).coalesce(1).write.parquet(src + "/b=1")
    spark.range(1).select(
        F.lit("2026-02-05 10:00:00").cast("timestamp").alias("ts"),
        F.lit("sentinel").alias("grp"),
        F.lit(1.0).alias("v"),
    ).coalesce(1).write.parquet(src + "/b=2")

    ref = spark.range(20000).select((F.col("id") % 100).cast("double").alias("v"))
    ref_hist = histogram(ref, "v", bins=10, lo=0.0, hi=100.0)

    stream = (
        spark.readStream.schema(clean.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/b=*")
    )
    out = stream_psi_by_group(
        stream, ref_hist, "v", "ts", "grp",
        bins=10, lo=0.0, hi=100.0, window="1 day", watermark="1 hour",
    )
    name = f"t_drift_grp_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    rows = {r["grp"]: r for r in spark.table(name).collect()}
    assert set(rows) == {"clean", "shifted"}  # sentinel window never closes
    assert rows["clean"]["psi"] < 1e-6
    assert rows["shifted"]["psi"] > 0.1
    # equals the batch PSI on the same slice
    batch = psi(ref_hist, histogram(shifted, "v", bins=10, lo=0.0, hi=100.0))
    assert abs(rows["shifted"]["psi"] - round(batch, 6)) < 1e-4


def test_ledger_concurrent_equals_serial(spark, tmp_path):
    """concurrency>1 yields the same metrics + resume state as serial; a
    pre-completed partition is still skipped."""
    from vldt_spark.fields import Field
    from vldt_spark.model import Model
    from vldt_spark.plans.ledger import ValidationLedger

    class Row(Model):
        rid: int
        grp: str
        v: float = Field(ge=0.0)

    globals()["RowL"] = Row
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i % 7) - (1.0 if i % 11 == 0 else 0.0))
         for i in range(60)],
        "rid long, grp string, v double",
    )
    l1 = ValidationLedger(str(tmp_path / "serial"), "grp")
    m_serial = l1.run(df, Row, id_cols=["rid"])
    l2 = ValidationLedger(str(tmp_path / "conc"), "grp")
    m_conc = l2.run(df, Row, id_cols=["rid"], concurrency=3)
    key = lambda m: {k: (v["n_rows"], v["n_invalid"], v["passed"]) for k, v in m.items()}
    assert key(m_serial) == key(m_conc)
    # resume: nothing left to do on a second concurrent run
    assert l2.run(df, Row, id_cols=["rid"], concurrency=3) == {}


def test_stream_centroid_drift_matches_batch(spark, tmp_path):
    """Per-window streaming centroid drift: an aligned day matches the
    reference (cosine 1, L2 0), a rotated day reads orthogonal — and both
    windows' numbers equal the batch embedding_drift on the same slice."""
    from vldt_spark.checks.drift import embedding_drift
    from vldt_spark.streaming.drift_stream import stream_centroid_drift

    src = str(tmp_path / "cent_src")
    day1 = spark.range(40).select(
        F.lit("2026-01-01 10:00:00").cast("timestamp").alias("ts"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("emb"),
    )
    day2 = spark.range(40).select(
        F.lit("2026-01-02 10:00:00").cast("timestamp").alias("ts"),
        F.array(F.lit(0.0), F.lit(2.0), F.lit(0.0)).cast("array<float>").alias("emb"),
    )
    day1.unionByName(day2).coalesce(2).write.parquet(src)
    ref = spark.range(10).select(
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("emb")
    )

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = stream_centroid_drift(stream, ref, "emb", "ts", window="1 day")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_cent_stream")
        .start()
    )
    q.processAllAvailable()
    spark.range(1).select(
        F.lit("2026-01-06 10:00:00").cast("timestamp").alias("ts"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("emb"),
    ).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    rows = {
        str(r["window_start"])[:10]: r
        for r in spark.table("t_cent_stream").collect()
    }
    assert rows["2026-01-01"]["n_rows"] == 40
    assert abs(rows["2026-01-01"]["centroid_cosine"] - 1.0) < 1e-9
    assert rows["2026-01-01"]["centroid_l2"] < 1e-9
    assert abs(rows["2026-01-02"]["centroid_cosine"]) < 1e-9
    # batch twin agrees on the drifted slice: centroid (0,2,0) vs ref (1,0,0)
    b = embedding_drift(day2.select("emb"), ref, vec_col="emb").first()
    assert abs(rows["2026-01-02"]["centroid_l2"] - b["centroid_l2"]) < 1e-9
    assert abs(b["centroid_l2"] - (5.0 ** 0.5)) < 1e-6


def test_stream_centroid_cosine_matches_batch_under_null_elements(spark, tmp_path):
    """With null vector ELEMENTS the per-position counts differ, so a
    sum-based cosine would diverge from the batch check; the mean-based
    cosine agrees exactly."""
    import math
    import uuid

    from vldt_spark.checks.drift import embedding_drift
    from vldt_spark.streaming.drift_stream import stream_centroid_drift

    src = str(tmp_path / "cent_null_src")
    # position 0 present in both rows, position 1 only in the second:
    # mean = (2.0, 4.0); sum = (4.0, 4.0) — different directions
    day = spark.createDataFrame(
        [("2026-01-01 10:00:00", [1.0, None]), ("2026-01-01 11:00:00", [3.0, 4.0])],
        "ts string, emb array<float>",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "emb")
    day.coalesce(1).write.parquet(src)
    ref = spark.createDataFrame([([1.0, 1.0],)], "emb array<float>")

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    name = f"t_cent_null_{uuid.uuid4().hex[:8]}"
    q = (
        stream_centroid_drift(stream, ref, "emb", "ts", window="1 day")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    q.processAllAvailable()
    spark.createDataFrame(
        [("2026-02-01 10:00:00", [1.0, 1.0])], "ts string, emb array<float>"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "emb").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got = [r for r in spark.table(name).collect() if str(r["window_start"])[:7] == "2026-01"][0]
    b = embedding_drift(day.select("emb"), ref, vec_col="emb").first()
    # mean (2,4) vs ref (1,1): cos = 6/(sqrt(20)*sqrt(2)); sum-based would
    # give 8/(sqrt(32)*sqrt(2)) = 1.0 — the bug this test pins
    expected = 6.0 / (math.sqrt(20.0) * math.sqrt(2.0))
    assert abs(got["centroid_cosine"] - expected) < 1e-6
    assert abs(got["centroid_cosine"] - b["centroid_cosine"]) < 1e-6


def test_stream_centroid_all_null_positions_match_batch(spark, tmp_path):
    """The two all-null-position corners: (a) a position null in EVERY
    reference vector still counts the window mean² in the cosine
    denominator (batch: c·c never touches r); (b) a position null in
    every WINDOW vector drops out of L2 (batch: pow(c-r,2) is null and
    the sum skips it). Both must equal the batch numbers exactly."""
    import uuid

    from vldt_spark.checks.drift import embedding_drift
    from vldt_spark.streaming.drift_stream import stream_centroid_drift

    def run_pair(tag, cur_rows, ref_rows):
        src = str(tmp_path / f"cn_{tag}")
        cur = spark.createDataFrame(
            [("2026-01-01 10:00:00", v) for v in cur_rows], "ts string, emb array<float>"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "emb")
        cur.coalesce(1).write.parquet(src)
        ref = spark.createDataFrame([(v,) for v in ref_rows], "emb array<float>")
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        name = f"cn_{tag}_{uuid.uuid4().hex[:6]}"
        q = (
            stream_centroid_drift(stream, ref, "emb", "ts", window="1 day")
            .writeStream.outputMode("append").format("memory").queryName(name).start()
        )
        q.processAllAvailable()
        spark.createDataFrame(
            [("2026-03-01 10:00:00", ref_rows[0])], "ts string, emb array<float>"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "emb").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        q.stop()
        got = [r for r in spark.table(name).collect() if str(r["window_start"])[:7] == "2026-01"][0]
        b = embedding_drift(cur.select("emb"), ref, vec_col="emb").first()
        return got, b

    # (a) trailing all-null ref position: batch cosine 3/(5*1) = 0.6
    got, b = run_pair("refnull", [[3.0, 4.0]], [[1.0, None]])
    assert abs(b["centroid_cosine"] - 0.6) < 1e-9
    assert abs(got["centroid_cosine"] - b["centroid_cosine"]) < 1e-9
    assert abs(got["centroid_l2"] - b["centroid_l2"]) < 1e-9

    # (b) window all-null at a ref-non-null position: batch L2 skips it
    got2, b2 = run_pair("curnull", [[3.0, None]], [[1.0, 1.0]])
    assert abs(b2["centroid_l2"] - 2.0) < 1e-9  # only |3-1| contributes
    assert abs(got2["centroid_l2"] - b2["centroid_l2"]) < 1e-9
    assert abs(got2["centroid_cosine"] - b2["centroid_cosine"]) < 1e-9
