"""Distributed whole-table checks (SURVEY.md Table B).

Each check generalizes a reference validation primitive from one object to
10^12 rows, reusing the verdict + violation-lineage output shape
(/root/reference/src/error_handling.hpp:13-132 → violations array column).
"""

from vldt_spark.checks.column_stats import column_profile, column_stats, numeric_quantiles
from vldt_spark.checks.uniqueness import duplicate_keys, duplicate_rows, uniqueness_report
from vldt_spark.checks.referential import (
    bloom_build,
    bloom_build_hashed,
    bloom_size_bits,
    invalid_fk_values,
    ri_bloom_screen,
    ri_violation_rows,
    ri_report,
)
from vldt_spark.checks.tdigest import merge_digests, tdigest_quantiles
from vldt_spark.checks.cms import cms_heavy_hitters
from vldt_spark.checks.controlband import control_alarms, metric_control_report
from vldt_spark.checks.suggest import suggest_constraints, suite_from_suggestions
from vldt_spark.checks.layout import (
    file_layout_report,
    partition_health_report,
    partition_health_summary,
)
from vldt_spark.checks.schema_drift import schema_diff, schema_drift_report
from vldt_spark.checks.snapshot import snapshot_diff, snapshot_summary
from vldt_spark.checks.drift import (
    histogram,
    kl_divergence,
    psi,
    psi_by_group,
    ks_from_histograms,
    ks_by_group,
    js_by_group,
    chi2_by_group,
    categorical_psi_by_group,
    js_divergence,
    chi2_from_histograms,
    wasserstein_from_histograms,
    wasserstein_by_group,
    embedding_drift,
    drift_report,
    drift_by_window,
)
from vldt_spark.checks.rowinvariant import token_equality_violations
from vldt_spark.checks.schema_conf import schema_conformance, conforms
from vldt_spark.checks.suite import Suite, expect
from vldt_spark.checks.column_stats import frequent_values, mad_outliers, zscore_outliers
from vldt_spark.checks.dependencies import fd_report, functional_dependency
from vldt_spark.checks.classifier_eval import (
    auc_by_group,
    auc_report,
    best_threshold_report,
    brier_report,
    calibration_report,
    confusion_report,
    ece_report,
    pr_report,
    threshold_sweep,
)

__all__ = [
    "column_profile",
    "column_stats",
    "numeric_quantiles",
    "duplicate_keys",
    "duplicate_rows",
    "uniqueness_report",
    "invalid_fk_values",
    "ri_violation_rows",
    "ri_report",
    "bloom_build",
    "bloom_build_hashed",
    "bloom_size_bits",
    "ri_bloom_screen",
    "tdigest_quantiles",
    "merge_digests",
    "cms_heavy_hitters",
    "metric_control_report",
    "control_alarms",
    "suggest_constraints",
    "suite_from_suggestions",
    "partition_health_report",
    "partition_health_summary",
    "file_layout_report",
    "schema_diff",
    "schema_drift_report",
    "snapshot_diff",
    "snapshot_summary",
    "histogram",
    "kl_divergence",
    "psi",
    "psi_by_group",
    "ks_from_histograms",
    "ks_by_group",
    "js_by_group",
    "chi2_by_group",
    "categorical_psi_by_group",
    "js_divergence",
    "chi2_from_histograms",
    "wasserstein_from_histograms",
    "wasserstein_by_group",
    "drift_report",
    "embedding_drift",
    "drift_by_window",
    "token_equality_violations",
    "schema_conformance",
    "conforms",
    "Suite",
    "expect",
    "frequent_values",
    "zscore_outliers",
    "mad_outliers",
    "functional_dependency",
    "fd_report",
    "auc_report",
    "auc_by_group",
    "calibration_report",
    "ece_report",
    "brier_report",
    "confusion_report",
    "pr_report",
    "threshold_sweep",
    "best_threshold_report",
]
