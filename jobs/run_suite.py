"""spark-submit entrypoint for the declarative data-contract runner.

The CI-gate shape: evaluate a contract over a table, write the report,
exit non-zero when any expectation fails — the process exit code IS the
gate, so orchestration (Airflow/CI) needs no result parsing.

Cluster usage:

    zip -r vldt_spark.zip vldt_spark
    spark-submit --py-files vldt_spark.zip jobs/run_suite.py \\
        --input <table path> --output <report dir> \\
        [--model vldt_spark.flagship:TokenSequence] \\
        [--sources <dim path>]

``--model`` imports ``module:Class`` and derives the contract via
``Suite.from_model`` — the reference user's model doubles as the table
contract with zero extra code. Without ``--model`` a basic volume
contract (non-empty table) runs, mostly useful for smoke tests.

Local sandbox smoke:

    python jobs/run_suite.py --synthetic 50000 --output /tmp/vldt_contract
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="table path (parquet)")
    ap.add_argument("--output", required=True, help="report output dir")
    ap.add_argument("--model", help="module:Class to derive the contract from")
    ap.add_argument("--sources", help="sources dimension path (for ref= fields)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a deterministic synthetic token table of N rows")
    ap.add_argument("--master", default=os.environ.get("VLDT_MASTER"))
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from vldt_spark.checks.suite import Suite, expect
    from vldt_spark.plans.skew import aqe_skew_conf

    owns = SparkSession.getActiveSession() is None
    b = SparkSession.builder.appName("vldt_spark_suite")
    if args.master:
        b = b.master(args.master)
    for k, v in aqe_skew_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dims = {}
    if args.synthetic:
        from vldt_spark.sources.token_table import sources_dim, token_sequences

        df = token_sequences(spark, args.synthetic)
        dims["sources"] = sources_dim(spark)
        if not args.model:
            args.model = "vldt_spark.flagship:TokenSequence"
    else:
        df = spark.read.parquet(args.input)
        if args.sources:
            dims["sources"] = spark.read.parquet(args.sources)

    if args.model:
        mod_name, cls_name = args.model.split(":")
        model = getattr(importlib.import_module(mod_name), cls_name)
        suite = Suite.from_model(model, dims=dims)
        suite.expectations.insert(0, expect.row_count_between(lo=1))
    else:
        suite = Suite([expect.row_count_between(lo=1)])

    report = suite.run(df)
    report.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.output, "report")
    )
    rows = spark.read.parquet(os.path.join(args.output, "report")).collect()
    failed = [r for r in rows if not r["passed"]]
    summary = {
        "n_expectations": len(rows),
        "n_failed": len(failed),
        "failed": [
            {"check": r["check"], "column": r["column"], "metric": r["metric"]}
            for r in failed
        ],
        "passed": not failed,
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    if owns:
        spark.stop()
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
