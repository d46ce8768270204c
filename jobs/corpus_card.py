"""spark-submit entrypoint: dataset card + acceptance gates.

Produces the quantitative half of a datasheet (Gebru et al. 2021) for a
document corpus as one small parquet table of (metric, value) rows, and
— when thresholds are given — runs the card's declarative acceptance
gates (`expect.pii_frac_below`, `expect.distinct_text_frac_above`)
through `Suite.run`, exiting non-zero on a failed gate so the job slots
directly into CI, same contract as jobs/run_suite.py.

Cost model: ONE scalar-partial aggregate over the corpus (all row-local
expressions) + one |sources|-bounded side aggregate; `--approx` swaps
the exact distincts for HLL sketches — the 10^12-row mode. The gates add
one conditional scalar aggregate each. Nothing row-scale reaches the
driver.

Cluster usage:

    zip -r vldt_spark.zip vldt_spark
    spark-submit --py-files vldt_spark.zip jobs/corpus_card.py \\
        --input <documents path> --output <card dir> \\
        [--text-col text] [--by source] [--lang-col lang] [--approx] \\
        [--max-pii-frac 0.01] [--min-distinct-frac 0.99]

Local sandbox smoke:

    python jobs/corpus_card.py --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/vldt_card --max-pii-frac 0.01 --min-distinct-frac 0.99
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents table (parquet)")
    ap.add_argument("--output", required=True, help="card output dir")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--by", default="source")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--quality-threshold", type=float, default=0.5)
    ap.add_argument("--approx", action="store_true",
                    help="HLL distincts instead of exact (10^12-row mode)")
    ap.add_argument("--max-pii-frac", type=float,
                    help="fail (exit 1) if the PII match rate reaches this")
    ap.add_argument("--min-distinct-frac", type=float,
                    help="fail (exit 1) if exact-dup health drops to this")
    ap.add_argument("--master", default=os.environ.get("VLDT_MASTER"))
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from vldt_spark.functions.corpus import corpus_card
    from vldt_spark.plans.skew import aqe_skew_conf

    b = SparkSession.builder.appName("vldt_spark_corpus_card")
    if args.master:
        b = b.master(args.master)
    for k, v in aqe_skew_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = spark.read.parquet(args.input)
    lang = args.lang_col if args.lang_col in df.columns else None
    card = corpus_card(
        df,
        text_col=args.text_col,
        by=args.by,
        lang_col=lang,
        quality_threshold=args.quality_threshold,
        approx=args.approx,
    )
    card.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.output, "card")
    )

    expectations = []
    from vldt_spark.checks.suite import Suite, expect

    if args.max_pii_frac is not None:
        expectations.append(expect.pii_frac_below(args.text_col, args.max_pii_frac))
    if args.min_distinct_frac is not None:
        expectations.append(
            expect.distinct_text_frac_above(
                args.text_col, args.min_distinct_frac, approx=args.approx
            )
        )
    if expectations:
        suite = Suite(expectations)
        report = suite.run(df)
        report.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(args.output, "gates")
        )
        rows = report.collect()
        for r in rows:
            print(
                f"[card-gate] {r['check']}({r['column']}) metric={r['metric']}"
                f" threshold={r['threshold']} passed={r['passed']}"
            )
        if not all(r["passed"] for r in rows):
            print("corpus card gates FAILED", file=sys.stderr)
            return 1

    print(f"corpus card written to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
