"""B8 — per-row invariant: token-array equality vs a reference table.

Generalizes the reference's model equality (``to_dict() == to_dict()``,
/root/reference/vldt/models.py:106-109) to a join-based row invariant:
current.tokens must equal reference.tokens per doc_id. Array equality is a
native Catalyst comparison (no UDF, no explode).

Scale: an equi-join on doc_id. Both sides are the big table → sort-merge
join; pre-bucketing both tables by doc_id (or reusing Iceberg's
bucket-partitioning) removes the shuffle entirely. AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_equality_violations(
    cur: DataFrame,
    ref: DataFrame,
    *,
    key: str = "doc_id",
    col: str = "tokens",
) -> DataFrame:
    """Rows whose token array differs from the reference copy →
    (key, path, msg) violation rows, plus rows missing from ref.
    """
    r = ref.select(F.col(key), F.col(col).alias("__ref_tokens"))
    j = cur.select(key, col).join(r, key, "left")
    neq = j.where(
        F.col("__ref_tokens").isNull()
        | (F.col(col) != F.col("__ref_tokens"))
    )
    return neq.select(
        F.col(key),
        F.lit(col).alias("path"),
        F.when(F.col("__ref_tokens").isNull(), F.lit("No reference row for key"))
        .otherwise(F.lit("Token array differs from reference"))
        .alias("msg"),
    )


def equality_report(cur: DataFrame, ref: DataFrame, *, key: str = "doc_id", col: str = "tokens") -> DataFrame:
    """One-row summary: n_checked, n_equal, n_diff, n_missing_ref."""
    r = ref.select(F.col(key), F.col(col).alias("__ref"))
    j = cur.select(key, col).join(r, key, "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum((F.col("__ref").isNotNull() & (F.col(col) == F.col("__ref"))).cast("long")).alias("n_equal"),
        F.sum((F.col("__ref").isNotNull() & (F.col(col) != F.col("__ref"))).cast("long")).alias("n_diff"),
        F.sum(F.col("__ref").isNull().cast("long")).alias("n_missing_ref"),
    )
