"""spark-submit entrypoint: end-to-end training-corpus construction.

Composes the engine's pipeline operators in the order a real corpus build
runs them:

  1. validate      — fused schema/constraint pass; invalid rows quarantined
  2. exact dedup   — fingerprint groupBy, min-id survivor
  2b. paragraph dedup — CCNet-style boilerplate removal at paragraph
                     granularity (only when --para-min-docs >= 2); docs
                     whose every paragraph was boilerplate are dropped
  3. near dedup    — MinHash-LSH candidate pairs → connected components →
                     keep one representative per cluster
  4. quality gate  — drop documents under the quality threshold
  5. decontaminate — drop documents sharing 13-grams with an eval set
                     (only when --benchmark is given)
  6. domain cap    — deterministic per-source cap (hash-ranked)
  6b. mixture      — temperature-weighted per-source downsampling
                     (only when --mix-temperature > 0)
  7. split         — hash-threshold train/val/test assignment
  8. write         — surviving corpus (+ split column), the packing
                     layout (concat-then-chunk placement at
                     --pack-tokens), and the funnel report

    spark-submit --py-files vldt_spark.zip jobs/build_corpus.py \\
        --input <documents parquet> --output <corpus root> \\
        [--quality 0.4] [--cap-per-source 100000] [--jaccard 0.5] \\
        [--benchmark <eval parquet>] [--splits train=0.98,val=0.01,test=0.01] \\
        [--pack-tokens 2048] [--para-min-docs 2] \\
        [--mix-temperature 0.7 --mix-fraction 0.5]

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
    ap.add_argument("--benchmark", help="eval-set parquet (text col) to decontaminate against")
    ap.add_argument("--splits", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--pack-tokens", type=int, default=2048,
                    help="packing chunk size; 0 skips the layout stage")
    ap.add_argument("--para-min-docs", type=int, default=0,
                    help="drop paragraphs appearing in >= N distinct docs; "
                         "0 (default) skips the paragraph stage")
    ap.add_argument("--mix-temperature", type=float, default=0.0,
                    help="temperature for per-source mixture rebalancing; "
                         "0 (default) skips the mixture stage")
    ap.add_argument("--mix-fraction", type=float, default=0.5,
                    help="target corpus fraction for the mixture stage")
    ap.add_argument("--master", default=os.environ.get("VLDT_MASTER"))
    args = ap.parse_args(argv)
    if args.para_min_docs < 0 or args.para_min_docs == 1:
        ap.error(
            "--para-min-docs must be 0 (skip the stage) or >= 2; "
            "1 would drop every paragraph (each appears in >= 1 doc)"
        )

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

    # 2b. paragraph-granularity boilerplate removal (optional). Cleaned
    # text joins back onto the doc's other columns by id — the text column
    # dominates row width, so rewriting it through the reassembly agg and
    # joining the slim remainder is cheaper than carrying every column
    # through the paragraph explode. Runs BEFORE near dedup: stripping
    # shared boilerplate stops it from inflating MinHash similarity.
    n_paragraphs = None
    if args.para_min_docs >= 2:
        from vldt_spark.functions.dedup import paragraph_dedup

        cleaned = (
            paragraph_dedup(exact, min_docs=args.para_min_docs)
            .where(F.length("text") > 0)
            .select("doc_id", "text")
        )
        exact = materialize(
            cleaned.join(exact.drop("text"), "doc_id"), "paragraphs"
        )
        n_paragraphs = exact.count()

    # 3. near dedup (LSH pairs → clusters → representatives)
    pairs = minhash_lsh_pairs(exact, threshold=args.jaccard)
    near = materialize(dedup_near(exact, pairs), "near")
    n_near = near.count()

    # 4. quality gate
    scored = near.withColumn("quality", text_quality(F.col("text")))
    kept = materialize(scored.where(F.col("quality") >= args.quality), "quality")
    n_quality = kept.count()

    # 5. eval-set decontamination (optional; the anti-join's flagged-id
    # set is report-cardinality, so this adds one scan, no new shuffle
    # class — see functions/dedup.contamination_report)
    n_decontaminated = None
    if args.benchmark:
        from vldt_spark.functions.dedup import decontaminate

        bench = spark.read.parquet(args.benchmark)
        kept = materialize(
            decontaminate(kept, bench, shingle_k=13), "decontaminated"
        )
        n_decontaminated = kept.count()

    # 6. per-domain cap
    # Distinct seeds per hash-keyed stage — the composition rule in the
    # functions/sampling module docstring (shared seeds correlate stage
    # decisions completely).
    capped = stratified_cap(kept, "source", args.cap_per_source, "doc_id", seed=11)

    # 6b. temperature-weighted mixture rebalancing (optional): flattens
    # hot sources toward the n^tau mixture; rates broadcast back, the
    # corpus itself is never shuffled.
    n_mixture = None
    if args.mix_temperature > 0:
        from vldt_spark.functions.sampling import temperature_sample

        capped = materialize(
            temperature_sample(
                capped,
                "source",
                "doc_id",
                temperature=args.mix_temperature,
                target_fraction=args.mix_fraction,
                seed=23,
            ),
            "mixture",
        )
        n_mixture = capped.count()

    # 7. deterministic split assignment (reproducible from doc_id alone)
    from vldt_spark.functions.sampling import split_assign

    weights = {}
    for part in args.splits.split(","):
        name, w = part.split("=")
        weights[name.strip()] = float(w)
    capped = split_assign(capped, "doc_id", weights, seed=37)

    # 8. write corpus + packing layout + funnel report
    out = os.path.join(args.output, "corpus")
    capped.write.mode("overwrite").partitionBy("source").parquet(out)
    corpus = spark.read.parquet(out)
    n_final = corpus.count()
    split_counts = {
        r["split"]: r["n"]
        for r in corpus.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    n_packs = None
    if args.pack_tokens:
        from vldt_spark.functions.packing import chunk_layout

        layout = materialize(
            chunk_layout(
                corpus.where(F.col("split") == "train").withColumn(
                    "n_chars_", F.length("text")
                ),
                len_col="n_chars_",
                max_tokens=args.pack_tokens,
                buckets=64,
            ),
            "layout",
        )
        # packs per bucket = ceil(stream length / chunk); exact from the
        # layout's per-bucket maxima — no token stream is materialized
        n_packs = (
            layout.groupBy("bucket")
            .agg(F.max(F.col("pack_last")).alias("last"))
            .agg(F.coalesce(F.sum(F.col("last") + 1), F.lit(0)).alias("n"))
            .first()["n"]
        )

    report = {
        "n_input": n_input,
        "n_valid": q["n_valid"],
        "n_quarantined": q["n_quarantined"],
        "n_after_exact_dedup": n_exact,
        "n_after_paragraph_dedup": n_paragraphs,
        "n_after_near_dedup": n_near,
        "n_after_quality": n_quality,
        "n_after_decontamination": n_decontaminated,
        "n_after_mixture": n_mixture,
        "n_final": n_final,
        "split_counts": split_counts,
        "n_train_packs": int(n_packs) if n_packs is not None else None,
    }
    with open(os.path.join(args.output, "funnel.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if owns:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
