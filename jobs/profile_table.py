"""spark-submit entrypoint: one-pass table profile + sketch suite.

The operational companion to the validation job: before (or alongside)
enforcing a contract, profile what the table actually contains —
per-column stats, quantiles (both the percentile_approx sketch and the
t-digest), heavy hitters (exact when cardinality is bounded, count-min
when not), and, when a previous snapshot is given, the schema-evolution
diff against it. Every output is a small parquet table under --output.

Cost model: ONE single-pass aggregate for column stats + quantile
sketches, one bounded sketch pipeline per heavy-hitter column, one
metadata-only diff (plus one bounded aggregate per side when
--null-rate-shift is set). Nothing row-scale ever reaches the driver.

Cluster usage:

    zip -r vldt_spark.zip vldt_spark
    spark-submit --py-files vldt_spark.zip jobs/profile_table.py \\
        --input <table path> --output <profile dir> \\
        [--numeric-cols a,b] [--hh-cols source,lang] [--hh-k 20] \\
        [--tdigest-by source] [--previous <older snapshot path>]

Local sandbox smoke:

    python jobs/profile_table.py --synthetic 50000 --output /tmp/vldt_profile
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="table path (parquet)")
    ap.add_argument("--output", required=True, help="profile output dir")
    ap.add_argument("--numeric-cols", help="comma list for quantile profiling")
    ap.add_argument("--hh-cols", help="comma list for heavy-hitter sketches")
    ap.add_argument("--hh-k", type=int, default=20)
    ap.add_argument("--tdigest-by", help="group column for per-group t-digest")
    ap.add_argument("--previous", help="older snapshot for schema drift")
    ap.add_argument("--null-rate-shift", action="store_true",
                    help="enrich the schema diff with null-rate deltas")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="deterministic synthetic token table of N rows")
    ap.add_argument("--master", default=os.environ.get("VLDT_MASTER"))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql import SparkSession

    from vldt_spark.checks.cms import cms_heavy_hitters
    from vldt_spark.checks.column_stats import column_stats, numeric_quantiles
    from vldt_spark.checks.schema_drift import schema_drift_report
    from vldt_spark.checks.tdigest import tdigest_quantiles
    from vldt_spark.plans.skew import aqe_skew_conf

    b = SparkSession.builder.appName("vldt_spark_profile")
    if args.master:
        b = b.master(args.master)
    for k, v in aqe_skew_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from vldt_spark.sources.token_table import token_sequences

        df = token_sequences(spark, args.synthetic)
    else:
        if not args.input:
            print("either --input or --synthetic is required", file=sys.stderr)
            return 2
        df = spark.read.parquet(args.input)

    out = args.output
    column_stats(df).write.mode("overwrite").parquet(os.path.join(out, "column_stats"))

    numeric = (
        [c.strip() for c in args.numeric_cols.split(",")]
        if args.numeric_cols
        else [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.NumericType)
        ]
    )
    if numeric:
        numeric_quantiles(df, numeric).write.mode("overwrite").parquet(
            os.path.join(out, "quantiles_sketch")
        )
        td = tdigest_quantiles(
            df, numeric[0], [0.01, 0.25, 0.5, 0.75, 0.99], by=args.tdigest_by
        )
        td.write.mode("overwrite").parquet(os.path.join(out, "tdigest"))

    hh_cols = (
        [c.strip() for c in args.hh_cols.split(",")]
        if args.hh_cols
        else [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        ][:2]
    )
    for c in hh_cols:
        cms_heavy_hitters(df, c, k=args.hh_k).withColumn(
            "column", F.lit(c)
        ).write.mode("overwrite").parquet(os.path.join(out, f"heavy_hitters_{c}"))

    if args.previous:
        prev = spark.read.parquet(args.previous)
        schema_drift_report(
            prev, df, with_null_rates=args.null_rate_shift
        ).write.mode("overwrite").parquet(os.path.join(out, "schema_drift"))

    print(f"profile written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
