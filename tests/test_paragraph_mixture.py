"""Paragraph-granularity dedup and temperature-weighted mixture sampling.

Covers the two corpus-construction operators added late in round 3:
CCNet-style paragraph boilerplate removal / first-occurrence dedup
(functions/dedup.paragraph_dedup) and the mC4/XLM-R temperature mixture
filter (functions/sampling.temperature_sample).
"""

import pytest
from pyspark.sql import functions as F

from vldt_spark.functions.dedup import paragraph_dedup
from vldt_spark.functions.sampling import deterministic_sample, temperature_sample


def _docs(spark):
    rows = [
        (1, "alpha one\nSubscribe Now\nalpha two"),
        (2, "beta one\nsubscribe now "),  # case/trim-variant of the banner
        (3, "gamma solo"),
        (4, "SUBSCRIBE NOW\ndelta tail"),
        (5, "Subscribe Now"),  # entirely boilerplate
        (6, "epsilon a\nepsilon b"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_paragraph_boilerplate_removed_order_preserved(spark):
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(_docs(spark), min_docs=3).collect()
    }
    assert len(out) == 6  # every doc survives, even the all-boiler one
    assert out[1]["text"] == "alpha one\nalpha two"
    assert out[1]["n_paras"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["text"] == "beta one"
    assert out[3]["text"] == "gamma solo" and out[3]["n_removed"] == 0
    assert out[4]["text"] == "delta tail"
    assert out[5]["text"] == "" and out[5]["n_removed"] == 1
    assert out[6]["text"] == "epsilon a\nepsilon b"


def test_paragraph_below_min_docs_kept(spark):
    # the banner appears in 4 docs; min_docs=5 means it is NOT boilerplate
    out = paragraph_dedup(_docs(spark), min_docs=5).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_paragraph_first_mode_keeps_global_first(spark):
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(_docs(spark), mode="first").collect()
    }
    # banner's first occurrence is (doc 1, pos 1) — kept there, dropped later
    assert out[1]["text"] == "alpha one\nSubscribe Now\nalpha two"
    assert out[2]["text"] == "beta one"
    assert out[4]["text"] == "delta tail"
    assert out[5]["text"] == ""
    # unique paragraphs untouched
    assert out[6]["text"] == "epsilon a\nepsilon b" and out[6]["n_removed"] == 0


def test_paragraph_dedup_portable_hash_matches_prod(spark):
    docs = _docs(spark)
    a = sorted(paragraph_dedup(docs, min_docs=3).collect())
    b = sorted(paragraph_dedup(docs, min_docs=3, hash_fn="md5").collect())
    assert a == b


def test_paragraph_dedup_rejects_bad_params(spark):
    with pytest.raises(ValueError, match="unknown mode"):
        paragraph_dedup(_docs(spark), mode="fuzzy")
    with pytest.raises(ValueError, match="min_docs"):
        paragraph_dedup(_docs(spark), min_docs=1)


def _mix(spark, n_a=400, n_b=20):
    a = spark.range(n_a).select(
        F.col("id").alias("doc_id"), F.lit("common").alias("source")
    )
    b = spark.range(n_b).select(
        (F.col("id") + 10_000).alias("doc_id"), F.lit("rare").alias("source")
    )
    return a.unionByName(b)


def test_temperature_sample_rare_source_saturates(spark):
    df = _mix(spark)
    out = temperature_sample(
        df, "source", "doc_id", temperature=0.1, target_fraction=0.5
    )
    by_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # rate for the rare source caps at 1 → every rare row kept
    assert by_src["rare"] == 20
    # common source is downsampled well below its raw share
    assert 0 < by_src["common"] < 400 * 0.5


def test_temperature_one_equals_plain_fraction(spark):
    df = _mix(spark)
    # τ=1 → r_s = target_fraction for every source → identical row set to
    # the plain deterministic sample at the same hash/seed
    t = temperature_sample(df, "source", "doc_id", temperature=1.0, target_fraction=0.3)
    p = deterministic_sample(df, 0.3, "doc_id")
    assert sorted(r["doc_id"] for r in t.collect()) == sorted(
        r["doc_id"] for r in p.collect()
    )


def test_temperature_sample_deterministic_across_partitioning(spark):
    df = _mix(spark)
    out1 = sorted(
        r["doc_id"]
        for r in temperature_sample(df, "source", "doc_id", hash_fn="md5").collect()
    )
    out2 = sorted(
        r["doc_id"]
        for r in temperature_sample(
            df.repartition(13), "source", "doc_id", hash_fn="md5"
        ).collect()
    )
    assert out1 == out2 and len(out1) > 0


def test_temperature_sample_rejects_bad_params(spark):
    df = _mix(spark, 5, 5)
    with pytest.raises(ValueError, match="temperature"):
        temperature_sample(df, "source", "doc_id", temperature=0.0)
    with pytest.raises(ValueError, match="target_fraction"):
        temperature_sample(df, "source", "doc_id", target_fraction=1.5)


def test_build_corpus_paragraph_and_mixture_stages(spark, tmp_path):
    """--para-min-docs strips injected boilerplate before near dedup;
    --mix-temperature rebalances sources; funnel stays monotone and both
    stages are materialized + reported."""
    import json
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    from jobs.build_corpus import main as corpus_main

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # half the docs get a shared banner paragraph appended
    dirty = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit("\nSubscribe To Our Newsletter")),
        ).otherwise(F.col("text")),
    )
    src = str(tmp_path / "docs")
    dirty.write.parquet(src)
    out = str(tmp_path / "corpus")
    assert corpus_main([
        "--input", src, "--output", out,
        "--quality", "0.0", "--cap-per-source", "10000",
        "--para-min-docs", "2", "--mix-temperature", "0.5",
        "--mix-fraction", "0.5", "--pack-tokens", "0",
    ]) == 0
    rep = json.load(open(out + "/funnel.json"))
    assert rep["n_after_paragraph_dedup"] is not None
    assert rep["n_after_exact_dedup"] >= rep["n_after_paragraph_dedup"]
    assert rep["n_after_mixture"] is not None
    assert rep["n_after_mixture"] < rep["n_after_quality"]
    assert rep["n_final"] == rep["n_after_mixture"]
    for stage in ("paragraphs", "mixture"):
        assert os.path.isdir(os.path.join(out, "stages", stage)), stage
    # the banner paragraph is gone from every surviving text
    cleaned = spark.read.parquet(os.path.join(out, "stages", "paragraphs"))
    assert cleaned.where(F.col("text").contains("Subscribe To")).count() == 0
    # and the non-banner half of each text survived intact
    assert cleaned.where(F.col("text").contains("\n")).count() == 0


def test_paragraph_dedup_regex_special_separator(spark):
    """Separators are treated literally (regex-quoted), so '.' splits on
    the dot character rather than matching any character."""
    rows = [(1, "a.shared.b"), (2, "shared"), (3, "c.shared")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(df, sep=".").collect()}
    assert out == {1: "a.b", 2: "", 3: "c"}


def test_importance_sample_prefers_heavy_rows(spark):
    from vldt_spark.functions.sampling import importance_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        # 100 heavy rows (weight 50) vs 900 light rows (weight 1)
        F.when(F.col("id") < 100, F.lit(50.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    out = importance_sample(df, "w", "doc_id", target_fraction=0.2)
    rows = out.collect()
    heavy = sum(1 for r in rows if r["doc_id"] < 100)
    light = len(rows) - heavy
    # heavy rate = min(1, .2*1000*50/5900) = 1 → all 100 kept
    assert heavy == 100
    # light rate ≈ .2*1000/5900 ≈ 0.034 → a small fraction of 900
    assert 0 < light < 100


def test_importance_sample_deterministic_and_drops_bad_weights(spark):
    import pytest as _pytest

    from vldt_spark.functions.sampling import importance_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit(None).cast("double"))
        .when(F.col("id") % 10 == 1, F.lit(-2.0))
        .otherwise((F.col("id") % 7 + 1).cast("double"))
        .alias("w"),
    )
    a = sorted(r["doc_id"] for r in importance_sample(df, "w", "doc_id", target_fraction=0.5, hash_fn="md5").collect())
    b = sorted(r["doc_id"] for r in importance_sample(df.repartition(9), "w", "doc_id", target_fraction=0.5, hash_fn="md5").collect())
    assert a == b and len(a) > 0
    assert not any(d % 10 in (0, 1) for d in a)  # null/negative weights dropped
    with _pytest.raises(ValueError, match="target_fraction"):
        importance_sample(df, "w", "doc_id", target_fraction=0.0)


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_temperature_sample_plan_fact_broadcast_join(spark, tmp_path):
    """The fact scan is filtered through a BroadcastHashJoin against the
    tiny rates table — the fact side is never exchanged before the join
    (the 100 TB property: one pass over the corpus)."""
    from vldt_spark.functions.sampling import temperature_sample

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    docs = spark.read.parquet(src)
    out = temperature_sample(docs, "source", "doc_id")
    out.collect()
    plan = _executed_plan(out)
    assert "BroadcastHashJoin" in plan
    # the fact side feeds the broadcast join straight from the scan:
    # no Exchange between the parquet scan of the full row and the join
    fact_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in fact_side


def test_importance_sample_plan_fact_broadcast_join(spark, tmp_path):
    from vldt_spark.functions.sampling import importance_sample

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    docs = spark.read.parquet(src).select("doc_id", "n_chars")
    out = importance_sample(docs, "n_chars", "doc_id", target_fraction=0.4)
    out.collect()
    plan = _executed_plan(out)
    # totals come back as a broadcast nested-loop (1-row build side);
    # the fact side is never hash-exchanged
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan.split("BroadcastExchange")[0]


def test_paragraph_dedup_plan_broadcast_decision_set(spark, tmp_path):
    """The boilerplate decision set joins back by BROADCAST; the only
    fact-side exchange is the per-doc reassembly groupBy."""
    from vldt_spark.functions.dedup import paragraph_dedup

    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    docs = spark.read.parquet(src).select("doc_id", "text")
    out = paragraph_dedup(docs)
    out.collect()
    plan = _executed_plan(out)
    # the decision set comes back by broadcast — never a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the only fact-side hash exchanges are the per-doc reassembly
    # (doc_id) and the decision-set aggregate (__ph[, doc_id]) — no
    # exchange carries the exploded paragraphs on any other key
    import re

    keys = {
        m.group(1).split("#")[0]
        for m in re.finditer(r"Exchange hashpartitioning\((\w+#?\d*)", plan)
    }
    assert keys <= {"doc_id", "__ph"}, keys


def test_paragraph_dedup_preserves_null_text_docs(spark):
    """NULL-text documents survive with NULL text and n_paras = 0 (the
    one-row-per-input-document invariant), in both modes and both hash
    paths."""
    rows = [(1, None), (2, "a\nb"), (3, None), (4, "a\nc")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for mode in ("boilerplate", "first"):
        for hf in ("xxhash64", "md5"):
            out = {r["doc_id"]: r for r in paragraph_dedup(df, mode=mode, hash_fn=hf).collect()}
            assert set(out) == {1, 2, 3, 4}, (mode, hf)
            assert out[1]["text"] is None and out[1]["n_paras"] == 0
            assert out[3]["text"] is None and out[3]["n_removed"] == 0
            assert out[2]["n_paras"] == 2


def test_temperature_sample_drops_null_groups_and_keeps_rate(spark):
    """NULL-group rows are excluded from BOTH the totals and the output,
    so the surviving fraction of non-null rows matches target_fraction
    instead of being deflated by phantom null-group mass."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, F.lit(None).cast("string"))
        .otherwise(F.lit("src"))
        .alias("source"),
    )
    out = temperature_sample(df, "source", "doc_id", temperature=1.0, target_fraction=0.5)
    rows = out.collect()
    assert all(r["source"] == "src" for r in rows)
    # 500 non-null rows at rate 0.5 → ~250, not ~125
    assert 200 < len(rows) < 300


def test_mixture_report_saturated_source_gap(spark):
    from vldt_spark.functions.sampling import mixture_report, temperature_sample

    df = _mix(spark)  # common: 400, rare: 20
    sampled = temperature_sample(df, "source", "doc_id", temperature=0.1, target_fraction=0.5)
    rep = {r["source"]: r for r in mixture_report(df, sampled, "source", temperature=0.1).collect()}
    # the rare source's rate saturated at 1 (all 20 kept) — it cannot
    # reach its flattened ~0.44 target share, so its gap is negative
    assert rep["rare"]["n_after"] == 20
    assert rep["rare"]["share_gap"] < 0
    assert rep["common"]["share_gap"] > 0
    for r in rep.values():
        assert abs(r["achieved_share"] - (r["target_share"] + r["share_gap"])) < 1e-6
    # shares sum to 1 on both axes
    assert abs(sum(r["target_share"] for r in rep.values()) - 1.0) < 1e-5
    assert abs(sum(r["achieved_share"] for r in rep.values()) - 1.0) < 1e-5


# ---------------------------------------------------------------- epochs


def _epoch_docs(spark):
    # three sources with very different token mass: web dominates,
    # wiki mid, books tiny — the classic "epochs per source" setup
    rows = []
    for i in range(40):
        rows.append((i, "web", 100))
    for i in range(40, 50):
        rows.append((i, "wiki", 100))
    for i in range(50, 54):
        rows.append((i, "books", 100))
    rows.append((99, None, 100))      # null source: dropped
    rows.append((98, "web", None))    # null tokens: dropped
    rows.append((97, "web", 0))       # zero tokens: dropped
    return spark.createDataFrame(rows, "doc_id int, source string, n_tok int")


def test_mixture_epochs_expected_token_mass(spark):
    from vldt_spark.functions.sampling import mixture_epochs

    df = _epoch_docs(spark)
    # budget defaults to corpus total (5400 tokens); equal target thirds.
    # web: 1800/4000 = 0.45 epochs (thin); wiki: 1800/1000 = 1.8 (repeat);
    # books: 1800/400 = 4.5 -> capped at 4.0
    out = mixture_epochs(
        df, "source", "doc_id", "n_tok",
        {"web": 1.0, "wiki": 1.0, "books": 1.0},
        max_epochs=4.0,
    )
    per = {r["source"]: r for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n"),
                                     F.max("epoch").alias("max_ep")).collect()}
    # dropped rows never materialize
    assert None not in per and set(per) == {"web", "wiki", "books"}
    # web thinned: 0 full epochs, ~45% of 40 docs, epoch column == 1
    assert 0 < per["web"]["n"] < 40 and per["web"]["max_ep"] == 1
    # wiki repeated: every doc appears at least once, some twice
    assert 10 <= per["wiki"]["n"] <= 20 and per["wiki"]["max_ep"] == 2
    # books capped at exactly 4 integer epochs: deterministic 16 copies
    assert per["books"]["n"] == 16 and per["books"]["max_ep"] == 4
    # copy indexes are dense 1..n per doc
    gaps = (
        out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), F.max("epoch").alias("m"))
        .where(F.col("n") != F.col("m")).count()
    )
    assert gaps == 0


def test_mixture_epochs_deterministic_across_partitioning(spark):
    from vldt_spark.functions.sampling import mixture_epochs

    df = _epoch_docs(spark)
    shares = {"web": 0.2, "wiki": 0.5, "books": 0.3}
    a = mixture_epochs(df, "source", "doc_id", "n_tok", shares, seed=7)
    b = mixture_epochs(
        df.repartition(13, "doc_id"), "source", "doc_id", "n_tok", shares, seed=7
    )
    ra = sorted((r["doc_id"], r["epoch"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["epoch"]) for r in b.collect())
    assert ra == rb and len(ra) > 0


def test_mixture_epochs_explicit_budget_and_validation(spark):
    from vldt_spark.functions.sampling import mixture_epochs

    df = _epoch_docs(spark)
    # explicit half-size budget: books target = 0.5*2700/400 = 3.375 epochs
    out = mixture_epochs(
        df, "source", "doc_id", "n_tok", {"books": 1.0, "web": 1.0},
        total_tokens=2700.0, max_epochs=8.0,
    )
    books = out.where(F.col("source") == "books")
    n = books.count()
    assert 4 * 3 <= n <= 4 * 4  # 3 full epochs + hash-selected extras
    with pytest.raises(ValueError):
        mixture_epochs(df, "source", "doc_id", "n_tok", {})
    with pytest.raises(ValueError):
        mixture_epochs(df, "source", "doc_id", "n_tok", {"web": -1.0})
    with pytest.raises(ValueError):
        mixture_epochs(df, "source", "doc_id", "n_tok", {"web": 1.0}, max_epochs=0)
    with pytest.raises(ValueError):
        mixture_epochs(df, "source", "doc_id", "n_tok", {"web": 1.0}, total_tokens=-5)


def test_mixture_epochs_report_shares_and_caps(spark):
    from vldt_spark.functions.sampling import mixture_epochs, mixture_epochs_report

    df = _epoch_docs(spark)
    shares = {"web": 2.0, "wiki": 1.0, "books": 1.0}  # normalized to .5/.25/.25
    out = mixture_epochs(df, "source", "doc_id", "n_tok", shares, max_epochs=2.0)
    rep = {r["source"]: r for r in
           mixture_epochs_report(df, out, "source", "n_tok", shares).collect()}
    assert rep["web"]["target_share"] == 0.5
    # books wanted 1350/400 = 3.375 epochs but capped at 2: under target
    assert rep["books"]["epochs_realized"] == 2.0
    assert rep["books"]["share_gap"] < 0
    # achieved = target + gap, and achieved shares sum to 1
    for r in rep.values():
        assert abs(r["achieved_share"] - (r["target_share"] + r["share_gap"])) < 1e-6
    assert abs(sum(r["achieved_share"] for r in rep.values()) - 1.0) < 1e-5
    # tokens_after consistency: epochs_realized * tokens_before
    for r in rep.values():
        assert abs(r["tokens_after"] - r["epochs_realized"] * r["tokens_before"]) < 1.0


# ------------------------------------------------------------- leakage


def _leak_fixture(spark):
    # pairs: (1,2) both train-ish keys? — splits fixed via a stored table
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.8), (5, 6, 0.7), (1, 6, 0.6)],
        "id_a int, id_b int, jaccard double",
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "train"), (4, "test"),
         (5, "val"), (6, "test")],
        "doc_id int, split string",
    )
    return pairs, splits


def test_split_leakage_report_table_path(spark):
    from vldt_spark.functions.sampling import split_leakage_report

    pairs, splits = _leak_fixture(spark)
    rep = {
        (r["split_a"], r["split_b"]): (r["n_pairs"], r["leaked"])
        for r in split_leakage_report(pairs, splits=splits).collect()
    }
    # (1,2) train-train; (3,4) train-test; (5,6) val-test(ordered test,val);
    # (1,6) train-test
    assert rep[("train", "train")] == (1, False)
    assert rep[("test", "train")] == (2, True)
    assert rep[("test", "val")] == (1, True)
    assert len(rep) == 3


def test_split_leakage_weights_path_matches_split_assign(spark):
    from vldt_spark.functions.sampling import (
        split_assign,
        split_leakage_report,
    )

    docs = spark.createDataFrame(
        [(f"doc{i}",) for i in range(200)], "doc_id string"
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    assigned = split_assign(docs, "doc_id", w, seed=7, hash_fn="md5")
    # adjacent-id pairs
    pairs = spark.createDataFrame(
        [(f"doc{i}", f"doc{i+1}") for i in range(0, 199, 2)],
        "id_a string, id_b string",
    )
    via_weights = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in split_leakage_report(
            pairs, weights=w, seed=7, hash_fn="md5"
        ).collect()
    }
    via_table = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in split_leakage_report(pairs, splits=assigned).collect()
    }
    # the weights path recomputes the SAME law split_assign applied
    assert via_weights == via_table
    assert sum(via_weights.values()) == 100


def test_split_leakage_weights_path_plan_has_no_join(spark):
    from vldt_spark.functions.sampling import split_leakage_report

    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "id_a string, id_b string"
    )
    plan = (
        split_leakage_report(pairs, weights={"train": 0.9, "test": 0.1})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan


def test_split_leakage_drop_ids(spark):
    from vldt_spark.functions.sampling import split_leakage_drop_ids

    pairs, splits = _leak_fixture(spark)
    dropped = {
        r["doc_id"]
        for r in split_leakage_drop_ids(
            pairs, {"test", "val"}, splits=splits
        ).collect()
    }
    # train docs 3 and 1 pair with protected docs (4, 6); protected docs
    # themselves (and protected-protected pairs like 5-6) never drop
    assert dropped == {1, 3}

    with pytest.raises(ValueError, match="protect"):
        split_leakage_drop_ids(pairs, [], splits=splits)
    with pytest.raises(ValueError, match="exactly one"):
        split_leakage_drop_ids(pairs, ["test"])


def test_split_assign_clustered_zero_leakage(spark):
    from vldt_spark.functions.dedup import near_dup_clusters
    from vldt_spark.functions.sampling import (
        split_assign,
        split_assign_clustered,
        split_leakage_report,
    )

    # 60 docs; a chain cluster {0,1,2}, a pair {10,11}, rest singletons
    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id int")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a int, id_b int"
    )
    clusters = near_dup_clusters(pairs)
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    assigned = split_assign_clustered(docs, "doc_id", w, clusters, seed=3)

    # every cluster member shares its representative's split
    by_doc = {r["doc_id"]: r["split"] for r in assigned.collect()}
    assert by_doc[0] == by_doc[1] == by_doc[2]
    assert by_doc[10] == by_doc[11]
    # singletons keep the plain split_assign law (same seed)
    plain = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs, "doc_id", w, seed=3).collect()
    }
    for i in range(12, 60):
        assert by_doc[i] == plain[i]
    # and cluster members hash the REPRESENTATIVE's key
    assert by_doc[1] == plain[0] and by_doc[11] == plain[10]

    # the audit is structurally clean: zero leaked pairs
    leaked = (
        split_leakage_report(pairs, splits=assigned)
        .where(F.col("leaked"))
        .count()
    )
    assert leaked == 0

    # output covers every input row exactly once
    assert assigned.count() == 60


def test_suite_split_leakage_guard(spark):
    from vldt_spark.checks.suite import Suite, expect

    pairs, splits = _leak_fixture(spark)
    # 4 pairs, 3 leaked -> 0.75; table under test carries the splits
    table = splits
    rep = {
        r["threshold"]: (r["metric"], r["passed"])
        for r in Suite(
            [
                expect.split_leakage_below(pairs, 0.8, use_table_splits=True),
                expect.split_leakage_below(pairs, 0.5, use_table_splits=True),
            ]
        ).run(table).collect()
    }
    assert abs(rep[0.8][0] - 0.75) < 1e-6 and rep[0.8][1] is True
    assert abs(rep[0.5][0] - 0.75) < 1e-6 and rep[0.5][1] is False

    # weights path runs on any table (splits recomputed from pair ids)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    r2 = Suite(
        [expect.split_leakage_below(pairs, 1.01, weights=w, hash_fn="md5")]
    ).run(table).first()
    assert r2["passed"] is True and 0.0 <= r2["metric"] <= 1.0

    # no pairs: clean 0.0, passes any positive threshold
    empty_pairs = pairs.where("id_a < 0")
    r3 = Suite(
        [expect.split_leakage_below(empty_pairs, 0.01, use_table_splits=True)]
    ).run(table).first()
    assert r3["metric"] == 0.0 and r3["passed"] is True

    with pytest.raises(ValueError, match="exactly one"):
        expect.split_leakage_below(pairs, 0.5)
