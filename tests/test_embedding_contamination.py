"""Embedding-level decontamination: exact-vs-LSH recall and removal."""

import math
import random

import pytest
from pyspark.sql import functions as F

from vldt_spark.functions.similarity import (
    decontaminate_by_embedding,
    embedding_contamination,
)

DIM = 32


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _perturb(v, rng, eps=0.25):
    w = [x + rng.gauss(0, eps / math.sqrt(DIM)) for x in v]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


@pytest.fixture(scope="module")
def tables(spark):
    rng = random.Random(11)
    corpus_rows = [(i, _unit(rng)) for i in range(300)]
    # bench: noisy copies of corpus ids 0..29 (true leaks) + 20 fresh rows
    bench_rows = [(1000 + i, _perturb(v, rng)) for i, v in corpus_rows[:30]] + [
        (2000 + j, _unit(rng)) for j in range(20)
    ]
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<double>")
    bench = spark.createDataFrame(bench_rows, "vec_id long, embedding array<double>")
    return corpus, bench


def test_exact_finds_all_planted_leaks(tables):
    corpus, bench = tables
    pairs = embedding_contamination(
        corpus, bench, method="exact", threshold=0.9, dim=DIM
    ).collect()
    got = {(r["corpus_id"], r["bench_id"]) for r in pairs}
    assert {(i, 1000 + i) for i in range(30)} <= got
    # fresh bench rows match nothing (random unit vectors, cos ~ 0)
    assert not any(b >= 2000 for _, b in got)


def test_lsh_recall_against_exact(tables):
    corpus, bench = tables
    exact = {
        (r["corpus_id"], r["bench_id"])
        for r in embedding_contamination(
            corpus, bench, method="exact", threshold=0.9, dim=DIM
        ).collect()
    }
    lsh = {
        (r["corpus_id"], r["bench_id"])
        for r in embedding_contamination(
            corpus, bench, method="lsh", threshold=0.9,
            n_planes=8, n_tables=12, dim=DIM,
        ).collect()
    }
    assert lsh <= exact  # LSH may miss, never invents (exact re-check)
    assert len(lsh) >= 0.9 * len(exact)


def test_decontaminate_removes_exactly_flagged(tables):
    corpus, bench = tables
    clean = decontaminate_by_embedding(
        corpus, bench, method="exact", threshold=0.9, dim=DIM
    )
    kept = {r["vec_id"] for r in clean.select("vec_id").collect()}
    flagged = {
        r["corpus_id"]
        for r in embedding_contamination(
            corpus, bench, method="exact", threshold=0.9, dim=DIM
        ).collect()
    }
    assert kept == {i for i in range(300)} - flagged
