"""Distributed whole-table checks (SURVEY.md Table B).

Each check generalizes a reference validation primitive from one object to
10^12 rows, reusing the verdict + violation-lineage output shape
(/root/reference/src/error_handling.hpp:13-132 → violations array column).
"""

from vldt_spark.checks.column_stats import column_profile, column_stats
from vldt_spark.checks.uniqueness import duplicate_keys, duplicate_rows
from vldt_spark.checks.referential import invalid_fk_values, ri_violation_rows
from vldt_spark.checks.drift import histogram, kl_divergence, psi, drift_report
from vldt_spark.checks.rowinvariant import token_equality_violations
from vldt_spark.checks.schema_conf import schema_conformance, conforms

__all__ = [
    "column_profile",
    "column_stats",
    "duplicate_keys",
    "duplicate_rows",
    "invalid_fk_values",
    "ri_violation_rows",
    "histogram",
    "kl_divergence",
    "psi",
    "drift_report",
    "token_equality_violations",
    "schema_conformance",
    "conforms",
]
