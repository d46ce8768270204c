"""spark-submit entrypoint: end-to-end training-corpus construction.

Composes the engine's pipeline operators in the order a real corpus build
runs them:

  1. validate      — fused schema/constraint pass; invalid rows quarantined
  2. exact dedup   — fingerprint groupBy, min-id survivor
  3. near dedup    — MinHash-LSH candidate pairs → connected components →
                     keep one representative per cluster
  4. quality gate  — drop documents under the quality threshold
  5. domain cap    — deterministic per-source cap (hash-ranked)
  6. write         — surviving corpus + a one-row funnel report

    spark-submit --py-files vldt_spark.zip jobs/build_corpus.py \\
        --input <documents parquet> --output <corpus root> \\
        [--quality 0.4] [--cap-per-source 100000] [--jaccard 0.5]

Every stage is deterministic (hash-keyed, no RNG), so a re-run over the
same input reproduces the same corpus byte-for-byte — the property that
makes corpus builds auditable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--quality", type=float, default=0.4)
    ap.add_argument("--cap-per-source", type=int, default=100_000)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--master", default=os.environ.get("VLDT_MASTER"))
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vldt_spark.plans.skew import aqe_skew_conf

    owns = SparkSession.getActiveSession() is None
    b = SparkSession.builder.appName("vldt_spark_build_corpus")
    if args.master:
        b = b.master(args.master)
    for k, v in aqe_skew_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from vldt_spark.engine import ValidationEngine
    from vldt_spark.fields import Field
    from vldt_spark.functions.dedup import (
        dedup_exact,
        dedup_near,
        minhash_lsh_pairs,
    )
    from vldt_spark.functions.sampling import stratified_cap
    from vldt_spark.functions.text import text_quality
    from vldt_spark.model import Model
    from vldt_spark.sources.quarantine import write_quarantined

    class Document(Model):
        doc_id: int = Field(not_null=True, unique=True)
        text: str = Field(not_null=True, min_size=1)
        source: str = Field(not_null=True)

    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    def materialize(df, stage: str):
        """Write a funnel stage to parquet and re-read it. Each stage is
        computed EXACTLY ONCE: without this, every downstream `.count()`
        re-triggers the upstream fingerprint groupBy / LSH join — three-plus
        redundant passes over the corpus at 100 TB. The written stages are
        also the audit trail (and the resume points) of the build."""
        path = os.path.join(args.output, "stages", stage)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    # 1. validate + quarantine
    res = ValidationEngine(Document).run(
        docs.select("doc_id", "text", "source"), id_cols=["doc_id"]
    )
    q = write_quarantined(res, os.path.join(args.output, "validation"))
    valid = spark.read.parquet(os.path.join(args.output, "validation", "data"))

    # 2. exact dedup (materialized — counted from parquet metadata, free)
    exact = materialize(dedup_exact(valid), "exact")
    n_exact = exact.count()

    # 3. near dedup (LSH pairs → clusters → representatives)
    pairs = minhash_lsh_pairs(exact, threshold=args.jaccard)
    near = materialize(dedup_near(exact, pairs), "near")
    n_near = near.count()

    # 4. quality gate
    scored = near.withColumn("quality", text_quality(F.col("text")))
    kept = materialize(scored.where(F.col("quality") >= args.quality), "quality")
    n_quality = kept.count()

    # 5. per-domain cap
    capped = stratified_cap(kept, "source", args.cap_per_source, "doc_id")

    # 6. write corpus + funnel report
    out = os.path.join(args.output, "corpus")
    capped.write.mode("overwrite").partitionBy("source").parquet(out)
    n_final = spark.read.parquet(out).count()

    report = {
        "n_input": n_input,
        "n_valid": q["n_valid"],
        "n_quarantined": q["n_quarantined"],
        "n_after_exact_dedup": n_exact,
        "n_after_near_dedup": n_near,
        "n_after_quality": n_quality,
        "n_final": n_final,
    }
    with open(os.path.join(args.output, "funnel.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if owns:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
