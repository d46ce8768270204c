"""Executable documentation — the README's python snippets run verbatim
under pytest, in the spirit of the reference's docs suite
(/root/reference/tests/test_docs.py:521-683, which executes every README
example). Each ```python block is exec'd in a registered module namespace
(so model annotations resolve, same as user code), then the resulting
objects are action-forced and sanity-checked."""

import re
import sys
import types

import pytest
from pyspark.sql import functions as F

README = "/root/repo/README.md"


def _python_blocks() -> list[str]:
    with open(README) as fh:
        text = fh.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.fixture(scope="module")
def ns(spark):
    """Namespace the snippets expect: a clean token table + dims for the
    quickstart/suite blocks, documents/embeddings for the pipeline block."""
    from vldt_spark.sources.token_table import sources_dim, token_sequences

    mod = types.ModuleType("readme_snippets")
    mod.spark = spark
    mod.df = token_sequences(spark, 2000, seed=42, clean=True)
    mod.sources_df = sources_dim(spark)
    mod.ref_df = token_sequences(spark, 2000, seed=43, clean=True)
    mod.seqs = mod.df
    mod.docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    mod.embeddings = emb
    mod.queries = emb.where(F.col("vec_id") < 5)
    sys.modules["readme_snippets"] = mod
    yield mod
    sys.modules.pop("readme_snippets", None)


def test_readme_has_expected_snippets():
    blocks = _python_blocks()
    assert len(blocks) >= 3
    assert "class TokenSequence(Model)" in blocks[0]
    assert "Suite" in blocks[1]
    assert "minhash_lsh_pairs" in blocks[2]


def test_readme_quickstart_executes(ns):
    exec(compile(_python_blocks()[0], README, "exec"), ns.__dict__)
    res = ns.res
    assert res.valid.count() == 2000  # clean fixture -> everything passes
    assert res.violations().count() == 0
    verd = {r["source"]: r for r in res.verdicts(["source"]).collect()}
    assert verd and all(r["passed"] for r in verd.values())


def test_readme_suite_snippet_executes(ns):
    exec(compile(_python_blocks()[1], README, "exec"), ns.__dict__)
    rep = {r["check"]: r for r in ns.report.collect()}
    assert rep and all(r["passed"] for r in rep.values())


def test_readme_overlap_snippet_executes(ns):
    exec(compile(_python_blocks()[3], README, "exec"), ns.__dict__)
    n_docs = ns.docs.count()
    ov = ns.overlap.collect()
    assert len(ov) == n_docs
    assert all(0 <= r["n_duplicated"] <= r["n_shingles"] for r in ov)
    cl = ns.cleaned.collect()
    assert len(cl) == n_docs
    assert all(r["n_removed_words"] <= r["n_words"] for r in cl)
    # the corpus carries injected exact-dup pairs -> >=50-token spans exist
    assert any(r["n_spans"] > 0 for r in cl)


def test_readme_token_dedup_snippet_executes(ns):
    exec(compile(_python_blocks()[4], README, "exec"), ns.__dict__)
    n = ns.seqs.count()
    # clean fixture has unique sequences -> all survive; columns intact
    assert ns.survivors.count() == n
    assert set(ns.seqs.columns) <= set(ns.survivors.columns)
    ov = ns.overlap_t.collect()
    assert len(ov) == n
    assert all(0 <= r["n_duplicated"] <= r["n_shingles"] for r in ov)
    health = ns.seq_health.collect()[0]
    assert health["check"] == "distinct_seq_frac_above"
    assert health["passed"] and health["metric"] == 1.0


def test_readme_web_token_snippet_executes(ns):
    exec(compile(_python_blocks()[5], README, "exec"), ns.__dict__)
    n_docs = ns.docs.count()
    prov = ns.prov.collect()
    assert prov and sum(r["n_docs"] for r in prov) == n_docs
    # the constructed URLs are unique per doc -> dedup keeps everything
    assert ns.deduped.count() == n_docs
    assert ns.kept.count() == n_docs  # blocklisted domain absent
    hist = {r["token"]: r["cnt"] for r in ns.hist.collect()}
    assert hist.get(ord(" "), 0) > 0 and hist.get(ord("a"), 0) > 0
    oov = {r["source"]: r["oov_rate"] for r in ns.oov.collect()}
    assert oov and all(0.0 < v < 1.0 for v in oov.values())
    assert ns.bigrams.count() == 10


def test_readme_sequence_gates_snippet_executes(ns):
    exec(compile(_python_blocks()[6], README, "exec"), ns.__dict__)
    n_docs = ns.docs.count()
    audit = ns.audit.collect()
    assert len(audit) == n_docs
    assert all(r["n_tok"] > 0 and r["max_run"] >= 1 for r in audit)
    assert all(0.0 < r["entropy"] for r in audit)  # real text is never constant
    z = ns.zipf.collect()[0]
    assert z["zipf_slope"] < 0  # rank-frequency always decays
    assert ns.fd.count() == 0  # doc_id -> text holds on the clean corpus
    rob = ns.robust.collect()[0]
    assert rob["n_below"] + rob["n_above"] < n_docs


def test_readme_sketch_snippet_executes(ns):
    exec(compile(_python_blocks()[7], README, "exec"), ns.__dict__)
    qs = ns.q.collect()
    assert qs and all(r["q"] is not None for r in qs)
    # every doc's source IS in the dim -> the screen reports nothing
    assert ns.bad.count() == 0
    assert len(ns.merges) == 16
    row = ns.toks_bpe.select(F.size("bpe_tokens").alias("n"), F.length("text").alias("c")).first()
    assert 0 < row["n"] <= row["c"]


def test_readme_pipeline_snippet_executes(ns):
    exec(compile(_python_blocks()[2], README, "exec"), ns.__dict__)
    # force the lazy plans the snippet builds and sanity-check shapes
    assert set(ns.pairs.columns) == {"id_a", "id_b", "jaccard_est"}
    assert set(ns.dupes.columns) == {"doc_id", "cluster_id"}
    assert ns.clean.count() > 0
    assert 0 < ns.mixed.count() <= ns.docs.count()
    assert ns.rep.count() == ns.docs.count()
    assert {"query_id", "vec_id", "cosine", "rank"} <= set(ns.neighb.columns)
    assert ns.neighb.where(F.col("rank") > 10).count() == 0
    assert ns.pii.count() > 0


def test_readme_lm_asof_skew_snippet_executes(ns):
    exec(compile(_python_blocks()[8], README, "exec"), ns.__dict__)
    n_docs = ns.docs.count()
    sc = ns.scored.collect()
    assert len(sc) == n_docs
    assert all(r["ppl"] > 1.0 for r in sc if r["n_tok"] > 0)
    att = ns.attributed.collect()
    assert att and all(
        r["asof_ts"] is None or r["asof_ts"] <= r["ts"] for r in att
    )
    skew = ns.skew.first()
    assert skew["n_rows"] == n_docs and skew["skew_factor"] >= 1.0


def test_readme_governance_snippet_executes(ns):
    exec(compile(_python_blocks()[9], README, "exec"), ns.__dict__)
    # every pair id appears in the corpus -> matrix counts sum to |pairs|
    n_pairs = ns.pairs.count()
    rep = ns.leak.collect()
    assert sum(r["n_pairs"] for r in rep) == n_pairs
    # clustered assignment covers the corpus and kills leakage
    from vldt_spark.functions.sampling import split_leakage_report

    assert ns.assigned.count() == ns.docs.count()
    assert (
        split_leakage_report(ns.pairs, splits=ns.assigned)
        .where(F.col("leaked"))
        .count()
        == 0
    )
    # drop set only ever names non-protected (train) docs
    assert ns.drop.count() <= n_pairs * 2
    d = {r["status"]: r["n_rows"] for r in ns.delta.collect()}
    assert d.get("added", 0) > 0 and d.get("removed", 0) == 0
    assert d.get("changed", 0) == 0  # prev is a pure subset


def test_readme_curation_snippet_executes(ns):
    exec(compile(_python_blocks()[13], README, "exec"), ns.__dict__)
    n_docs = ns.docs.count()
    # the raw corpus carries no PII -> redaction is the identity
    assert ns.clean.count() == n_docs
    rep = ns.redact.collect()
    assert sum(r["n_docs"] for r in rep) == n_docs
    assert all(r["n_docs_redacted"] == 0 for r in rep)
    # both tails dropped per source, most rows kept
    kept = ns.kept.count()
    assert 0 < kept < n_docs and kept > 0.6 * n_docs
    # no exact duplicates in the raw corpus -> empty matrix
    assert ns.matrix.count() == 0
    card = {r["metric"]: r["value"] for r in ns.card.collect()}
    assert card["n_docs"] == float(n_docs)
    assert card["distinct_text_frac"] == 1.0
    gate = ns.card_gate.collect()
    assert gate and all(r["passed"] for r in gate)
