"""spark-submit entrypoint: table-layout health audit with CI gates.

The pre-flight check before pointing a large job at a table: per
logical-partition skew/hot/small report, a one-row summary, and (when
--key is given) the per-file clustering-range report that tells you
whether pruning will actually happen.  Exit code 1 when a gate fails,
so a scheduler can block the downstream job on an unhealthy layout —
the same contract as jobs/run_suite.py.

Cost model: one map-side-combined aggregate per report; nothing
row-scale reaches the driver.

Cluster usage:

    zip -r vldt_spark.zip vldt_spark
    spark-submit --py-files vldt_spark.zip jobs/layout_audit.py \\
        --input <table path> --part-cols source,lang \\
        --output <audit dir> \\
        [--key doc_id] [--max-skew 4.0] [--max-hot-share 0.5]

Local sandbox smoke:

    python jobs/layout_audit.py --synthetic 50000 --part-cols source \\
        --output /tmp/vldt_layout
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="table path (parquet)")
    ap.add_argument("--part-cols", required=True,
                    help="comma list of logical partition columns")
    ap.add_argument("--output", required=True, help="audit output dir")
    ap.add_argument("--key", help="clustering key for the per-file report")
    ap.add_argument("--hot-factor", type=float, default=2.0)
    ap.add_argument("--small-frac", type=float, default=0.1)
    ap.add_argument("--max-skew", type=float,
                    help="gate: fail when max_skew_factor >= this")
    ap.add_argument("--max-hot-share", type=float,
                    help="gate: fail when hot_row_share >= this")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="deterministic synthetic token table of N rows")
    ap.add_argument("--master", default=os.environ.get("VLDT_MASTER"))
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from vldt_spark.checks.layout import (
        file_layout_report,
        partition_health_report,
        partition_health_summary,
    )
    from vldt_spark.plans.skew import aqe_skew_conf

    owns = SparkSession.getActiveSession() is None
    b = SparkSession.builder.appName("vldt_spark_layout_audit")
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

    os.makedirs(args.output, exist_ok=True)
    part_cols = [c.strip() for c in args.part_cols.split(",") if c.strip()]
    rep = partition_health_report(
        df, part_cols, hot_factor=args.hot_factor, small_frac=args.small_frac
    )
    rep.write.mode("overwrite").parquet(
        os.path.join(args.output, "partitions")
    )
    summary = partition_health_summary(
        df, part_cols, hot_factor=args.hot_factor, small_frac=args.small_frac
    ).first()
    summary_d = summary.asDict() if summary else {}
    with open(os.path.join(args.output, "summary.json"), "w") as fh:
        json.dump(summary_d, fh, indent=1, default=str)
    print(json.dumps(summary_d, default=str))

    if args.key and not args.synthetic:
        file_layout_report(df, key=args.key).write.mode("overwrite").parquet(
            os.path.join(args.output, "files")
        )

    failed = []
    if args.max_skew is not None and summary_d.get("max_skew_factor") is not None:
        if float(summary_d["max_skew_factor"]) >= args.max_skew:
            failed.append(
                f"max_skew_factor {summary_d['max_skew_factor']}"
                f" >= {args.max_skew}"
            )
    if (
        args.max_hot_share is not None
        and summary_d.get("hot_row_share") is not None
    ):
        if float(summary_d["hot_row_share"]) >= args.max_hot_share:
            failed.append(
                f"hot_row_share {summary_d['hot_row_share']}"
                f" >= {args.max_hot_share}"
            )
    if owns:
        spark.stop()
    if failed:
        print("LAYOUT GATES FAILED: " + "; ".join(failed), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
