"""Incremental (cross-snapshot) dedup: new batch vs seen corpus.

The reference's ingest loop validates each incoming object against
standing state (/root/reference/vldt models construct-on-ingest); the
distributed analogue is content-level dedup of a new crawl batch against
an existing corpus — exact (fingerprint anti-join with a Bloom fast
path) and near-dup (cross-corpus MinHash LSH).
"""

import pytest
from pyspark.sql import functions as F

from vldt_spark.checks.referential import bloom_build, bloom_probe_flag
from vldt_spark.functions.dedup import dedup_against_seen, near_dups_against_seen
from vldt_spark.functions.text import fingerprint

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank today "
    "while the sun sets slowly behind the tall mountains and the birds sing "
    "their evening songs across the quiet valley where farmers tend fields"
)


@pytest.fixture(scope="module")
def corpora(spark):
    seen = spark.createDataFrame(
        [
            (1, BASE),
            (2, "an archived article about harvest season and market prices"),
            (3, "release notes for version three of the pipeline toolkit"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "  " + BASE.replace("quick brown", "quick   brown") + " "),  # dup of seen 1 modulo whitespace
            (11, "a brand new report on irrigation techniques for dry years"),
            (12, "a brand new report on irrigation techniques for dry years"),  # within-batch dup of 11
            (13, "unique minutes of the village council meeting in march"),
        ],
        "doc_id long, text string",
    )
    return seen, new


def test_screened_equals_exact_and_batch_dedup(corpora):
    seen, new = corpora
    screened = dedup_against_seen(new, seen, bloom_screen=True)
    exact = dedup_against_seen(new, seen, bloom_screen=False)
    s = {(r["doc_id"], r["fp"]) for r in screened.collect()}
    e = {(r["doc_id"], r["fp"]) for r in exact.collect()}
    # the Bloom only ROUTES rows; membership is always decided exactly
    assert s == e
    # seen-dup 10 dropped; within-batch first-writer 11 kept, 12 dropped
    assert {doc_id for doc_id, _ in s} == {11, 13}


def test_within_batch_false_keeps_batch_dups(corpora):
    seen, new = corpora
    out = dedup_against_seen(new, seen, within_batch=False, bloom_screen=True)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {11, 12, 13}


def test_bloom_probe_has_no_false_negatives(corpora):
    """Every truly-seen fingerprint MUST flag maybe_member=True — a false
    negative would silently re-ingest a duplicate; false positives are
    fine (they just ride the exact confirmation join)."""
    seen, new = corpora
    seenf = seen.select(fingerprint(F.col("text")).alias("fp")).distinct()
    bitmap = bloom_build(seenf, "fp")
    newf = new.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    flagged = {r["doc_id"]: r["maybe_member"] for r in
               bloom_probe_flag(newf, "fp", bitmap).collect()}
    assert flagged[10] is True  # the true duplicate can never be missed


def test_near_dups_against_seen_cross_only(spark):
    seen = spark.createDataFrame(
        [(1, BASE), (2, "totally unrelated archived text about astronomy and "
                        "telescopes with many special domain words")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, BASE.replace("lazy", "sleepy")),  # near-dup of seen 1
            (11, BASE.replace("lazy", "sleepy") + " extra"),  # near-dup of 10 AND seen 1
            (12, "fresh content on beekeeping and hive management practices "
                 "with unique jargon words apiary nectar drone frames"),
        ],
        "doc_id long, text string",
    )
    pairs = near_dups_against_seen(
        new, seen, num_hashes=16, bands=4, threshold=0.3, hash_fn="md5"
    ).collect()
    got = {(r["new_id"], r["seen_id"]) for r in pairs}
    assert (10, 1) in got
    # cross-corpus ONLY: new×new (10,11) and seen×seen pairs never appear
    assert all(n in {10, 11, 12} and s in {1, 2} for n, s in got)
    assert (12, 1) not in got and (12, 2) not in got
    for r in pairs:
        assert 0.3 <= r["jaccard_est"] <= 1.0
