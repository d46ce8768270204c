"""Targeted quiet-window adjudication runs.

Re-measures a named subset of bench.py's rows with more reps than the
full bench affords, INTERLEAVED round-robin across queries so a
host-congestion wave lands on every row rather than biasing whichever
query it coincided with (same hygiene as tools/scaling_bench.py's
interleaved levels). Prints one JSON line: per-query rep arrays, best,
median.

Usage: python tools/targeted_bench.py <query> [<query> ...]
Env: VLDT_TARGETED_REPS (default 6), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPS = int(os.environ.get("VLDT_TARGETED_REPS", "6"))


def build_thunks(spark, names: list[str]):
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from vldt_spark.functions.dedup import (
        duplicated_ngram_fraction,
        duplicated_ngram_fraction_screened,
        exact_substr_dedup,
    )

    qs = entry_mod.queries()
    sf_dir = bench.SF_DIR

    def docs():
        return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # rows whose bench.py thunk differs from the gate query (aggregated
    # actions so the collect is O(1) rows at any SF) — keep the SAME work
    # shape as bench.py so the adjudication compares like with like
    special = {
        "dup_ngram_fraction_documents": lambda: duplicated_ngram_fraction(docs())
        .agg(F.sum("n_duplicated"), F.sum("n_shingles"))
        .collect(),
        "dup_ngram_screened": lambda: duplicated_ngram_fraction_screened(docs())
        .agg(F.sum("n_duplicated"), F.sum("n_shingles"))
        .collect(),
        "exact_substr_documents": lambda: exact_substr_dedup(docs(), k=5)
        .agg(F.sum("n_removed_words"), F.sum("n_spans"))
        .collect(),
        "mixture_epochs": lambda: _mixture_epochs_thunk(docs(), F),
        "corpus_shuffle": lambda: _corpus_shuffle_thunk(docs(), F),
        "sequence_stats_tokens": lambda: _sequence_stats_thunk(_toks(spark), F),
        "unigram_logprob_tokens": lambda: _unigram_thunk(_toks(spark), F),
        "token_dedup_exact": lambda: _token_dedup_thunk(_toks(spark)),
        "ppl_band_tokens": lambda: _ppl_band_thunk(_toks(spark), F),
    }
    thunks = {}
    for name in names:
        if name in special:
            thunks[name] = special[name]
        else:
            fn = qs[name]
            thunks[name] = lambda f=fn: f(spark, sf_dir).collect()
    return thunks


def _toks(spark):
    """The SAME 1M-row cached token table + scan-slot cap bench.py uses."""
    scan_slots = int(
        os.environ.get("VLDT_BENCH_SCAN_SLOTS", str(max(8, bench.CPUS // 2)))
    )
    path = bench.ensure_token_table(spark, bench.TOKEN_ROWS)
    return spark.read.parquet(path).coalesce(scan_slots)


def _token_dedup_thunk(toks):
    from vldt_spark.functions.dedup import token_dedup_exact

    return token_dedup_exact(toks).count()


def _ppl_band_thunk(toks, F):
    from vldt_spark.functions.lm import ppl_band_filter
    from vldt_spark.sources.token_table import VOCAB
    return (
        ppl_band_filter(toks, VOCAB, lo=0.1, hi=0.9, by="source", exact=False)
        .agg(F.count(F.lit(1)), F.avg("ppl"))
        .collect()
    )


def _sequence_stats_thunk(toks, F):
    from vldt_spark.functions.tokens import sequence_stats

    return (
        sequence_stats(toks, id_col="doc_id")
        .agg(
            F.count(F.lit(1)),
            F.avg("entropy"),
            F.max("max_run"),
            F.avg("distinct_ratio"),
        )
        .collect()
    )


def _unigram_thunk(toks, F):
    from vldt_spark.functions.lm import unigram_logprob
    from vldt_spark.sources.token_table import VOCAB

    return (
        unigram_logprob(toks, VOCAB)
        .agg(F.count(F.lit(1)), F.avg("mean_logp"), F.avg("ppl"))
        .collect()
    )


def _mixture_epochs_thunk(docs, F):
    from vldt_spark.functions.sampling import mixture_epochs

    return (
        mixture_epochs(
            docs, "source", "doc_id", "n_chars",
            {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
            max_epochs=5.0,
        )
        .agg(F.count(F.lit(1)), F.sum("n_chars"), F.max("epoch"))
        .collect()
    )


def _corpus_shuffle_thunk(docs, F):
    from vldt_spark.functions.sampling import corpus_shuffle

    return (
        corpus_shuffle(docs, "doc_id", 32, with_pos=True)
        .groupBy("shard")
        .agg(F.count(F.lit(1)), F.max("pos"), F.min("doc_id"))
        .collect()
    )


def main():
    names = sys.argv[1:]
    if not names:
        print("usage: targeted_bench.py <query> [<query> ...]", file=sys.stderr)
        sys.exit(2)
    spark = bench.build_session(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).agg({"id": "sum"}).collect()
    thunks = build_thunks(spark, names)
    # one untimed warm-up sweep (JIT/codegen/page cache), then interleaved reps
    for name in names:
        thunks[name]()
    reps: dict[str, list[float]] = {n: [] for n in names}
    for r in range(REPS):
        for name in names:
            t0 = time.perf_counter()
            thunks[name]()
            el = round(time.perf_counter() - t0, 3)
            reps[name].append(el)
            print(f"[targeted] round {r + 1}/{REPS} {name}: {el}s", file=sys.stderr, flush=True)

    def median(xs):
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)

    out = {
        n: {"best": min(v), "median": median(v), "reps": v} for n, v in reps.items()
    }
    print(json.dumps({"sf": bench.SF_DIR, "cpus": bench.CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
