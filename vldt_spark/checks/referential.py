"""B6 — referential integrity via anti-joins.

Generalizes nested-model existence (reference A15: a dict input must
construct a valid inner model) to a foreign-key-into-dimension constraint.

Scale strategy: never anti-join the 10^12-row fact table directly when the
FK column is low-cardinality — aggregate to ``distinct(fk)`` first (a
partial-agg shuffle of dim-like size), anti-join the *distinct values*
against the dim, then broadcast the (tiny) invalid-value set back. For
high-cardinality FKs use ``ri_violation_rows`` which lets Catalyst pick
broadcast vs sort-merge anti-join (AQE re-plans at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def invalid_fk_values(
    fact: DataFrame,
    fk: str,
    dim: DataFrame,
    dim_key: str,
    *,
    broadcast_dim: bool | None = None,
) -> DataFrame:
    """Distinct non-null FK values absent from the dimension (small output).

    ``broadcast_dim=True`` pins a broadcast anti-join — only when the dim's
    distinct keys are known to fit executor memory. The default (``None``)
    leaves the choice to AQE, which broadcasts small dims at runtime and
    falls back to shuffle for large ones — the safe default given this
    function is reachable from ``engine.run`` for any ``ref=`` field."""
    vals = fact.select(fk).where(F.col(fk).isNotNull()).distinct()
    d = dim.select(F.col(dim_key).alias(fk)).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    return vals.join(d, fk, "left_anti")


def ri_violation_rows(
    fact: DataFrame, fk: str, dim: DataFrame, dim_key: str, *, broadcast_dim: bool | None = None
) -> DataFrame:
    """Fact rows whose FK has no match in the dim (LEFT ANTI JOIN).

    ``broadcast_dim=True`` forces a broadcast anti-join (dim fits in
    executor memory); ``False`` forces shuffle; ``None`` lets AQE decide.
    Null FKs are not RI violations (they are not_null violations).
    """
    d = dim.select(F.col(dim_key).alias(fk)).distinct()
    if broadcast_dim is True:
        d = F.broadcast(d)
    return fact.where(F.col(fk).isNotNull()).join(d, fk, "left_anti")


def ri_report(fact: DataFrame, fk: str, dim: DataFrame, dim_key: str) -> DataFrame:
    """One row per invalid FK value with its row count — the shape the
    verdict/lineage tables ingest."""
    bad = invalid_fk_values(fact, fk, dim, dim_key)
    return (
        fact.join(F.broadcast(bad), fk, "left_semi")
        .groupBy(fk)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"))
    )
