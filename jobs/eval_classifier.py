"""spark-submit entrypoint for filter-model evaluation.

The model-governance shape: given a table carrying a probability-shaped
score column and a boolean/0-1 label column (a labeled audit slice —
human review, honeypot documents, delayed ground truth), write the full
evaluation bundle — exact tie-aware ROC AUC (corpus-level and per-slice),
reliability bins, ECE, Brier score, and the operating-point confusion
matrix at the shipped threshold — and exit non-zero when the AUC / ECE /
Brier acceptance bars fail, so the process exit code IS the deployment
gate for the quality filter.

Cluster usage:

    zip -r vldt_spark.zip vldt_spark
    spark-submit --py-files vldt_spark.zip jobs/eval_classifier.py \\
        --input <audit table path> --score score --label is_clean \\
        --output <report dir> [--group-by lang] [--threshold 0.5] \\
        [--min-auc 0.8] [--max-ece 0.1] [--max-brier 0.25] [--quantize 1000000]

Local sandbox smoke (scores the built-in quality classifier over the
synthetic documents table with injected junk as ground truth):

    python jobs/eval_classifier.py --synthetic /root/testdata/sf0.001 \\
        --output /tmp/vldt_clf_eval
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="audit table path (parquet)")
    ap.add_argument("--score", default="score", help="probability column")
    ap.add_argument("--label", default="label", help="boolean/0-1 label column")
    ap.add_argument("--output", required=True, help="report output dir")
    ap.add_argument("--group-by", help="optional slice column for per-group AUC")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="shipped decision threshold for the confusion report")
    ap.add_argument("--n-bins", type=int, default=10)
    ap.add_argument("--quantize", type=int, default=None,
                    help="score grid for AUC (bounds the per-score relation)")
    ap.add_argument("--min-auc", type=float, default=None)
    ap.add_argument("--max-ece", type=float, default=None)
    ap.add_argument("--max-brier", type=float, default=None)
    ap.add_argument("--synthetic",
                    help="sf dir: score the built-in quality classifier over "
                         "documents with injected junk as ground truth")
    ap.add_argument("--master", default=os.environ.get("VLDT_MASTER"))
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vldt_spark.checks.classifier_eval import (
        auc_by_group,
        auc_report,
        brier_report,
        calibration_report,
        confusion_report,
        ece_report,
    )

    owns = SparkSession.getActiveSession() is None
    b = SparkSession.builder.appName("vldt_spark_eval_classifier")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from vldt_spark.functions.text import classifier_quality_score

        docs = spark.read.parquet(
            os.path.join(args.synthetic, "documents.parquet")
        )
        df = docs.select(
            "lang",
            F.round(
                classifier_quality_score(
                    F.when(
                        F.col("doc_id") % 5 == 0,
                        F.lit("1234567890 1234567890 1234567890"),
                    ).otherwise(F.col("text"))
                ),
                6,
            ).alias(args.score),
            (F.col("doc_id") % 5 != 0).alias(args.label),
        )
        if not args.group_by:
            args.group_by = "lang"
    else:
        df = spark.read.parquet(args.input)

    reports = {
        "auc": auc_report(df, args.score, args.label, quantize=args.quantize),
        "calibration": calibration_report(
            df, args.score, args.label, n_bins=args.n_bins
        ),
        "ece": ece_report(df, args.score, args.label, n_bins=args.n_bins),
        "brier": brier_report(df, args.score, args.label),
        "confusion": confusion_report(
            df, args.score, args.label, threshold=args.threshold
        ),
    }
    if args.group_by:
        reports["auc_by_group"] = auc_by_group(
            df, args.score, args.label, args.group_by, quantize=args.quantize
        )
    for name, rep in reports.items():
        rep.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(args.output, name)
        )

    auc_row = spark.read.parquet(os.path.join(args.output, "auc")).first()
    ece_row = spark.read.parquet(os.path.join(args.output, "ece")).first()
    brier_row = spark.read.parquet(os.path.join(args.output, "brier")).first()
    gates = []
    if args.min_auc is not None:
        ok = auc_row["auc"] is not None and auc_row["auc"] > args.min_auc
        gates.append({"gate": "auc_above", "bar": args.min_auc,
                      "metric": auc_row["auc"], "passed": ok})
    if args.max_ece is not None:
        ok = ece_row["ece"] is not None and ece_row["ece"] < args.max_ece
        gates.append({"gate": "ece_below", "bar": args.max_ece,
                      "metric": ece_row["ece"], "passed": ok})
    if args.max_brier is not None:
        ok = brier_row["brier"] is not None and brier_row["brier"] < args.max_brier
        gates.append({"gate": "brier_below", "bar": args.max_brier,
                      "metric": brier_row["brier"], "passed": ok})
    summary = {
        "auc": auc_row["auc"],
        "ece": ece_row["ece"],
        "brier": brier_row["brier"],
        "n": auc_row["n_pos"] + auc_row["n_neg"],
        "gates": gates,
        "passed": all(g["passed"] for g in gates),
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    if owns:
        spark.stop()
    return 0 if summary["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
