"""Declarative check-suite runner — the data-contract entry point.

A ``Suite`` is an ordered list of expectations over one table; ``run``
produces a single report DataFrame (check, column, metric, threshold,
passed). This is the whole-table analogue of declaring a reference model
with constraints and asking "does the table conform?" — and the shape
every orchestration layer (Airflow sensor, CI gate, publish guard) wants.

Execution plan, not a loop of jobs:

  * every ROW-LOCAL expectation (not_null / null_rate / range / regex /
    isin) compiles into ONE fused aggregate pass over the table — a
    single scan with map-side combine, |expectations| output numbers;
  * uniqueness runs as the salted two-stage aggregate (B5), referential
    integrity as distinct-FK anti-join (B6), drift as the histogram PSI
    (B7) — each a bounded-output job on its key column only;
  * the report is the union of tiny one-row frames — driver-side cheap.

At 100 TB the whole suite therefore costs one full scan plus
dim-cardinality aggregates, the same budget as ``engine.run``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    kind: str
    column: str
    params: dict = field(default_factory=dict)


class expect:
    """Factory namespace for expectations (Great-Expectations-style
    surface re-expressed as Catalyst aggregates)."""

    @staticmethod
    def not_null(column: str, *, max_nulls: int = 0) -> Expectation:
        return Expectation("not_null", column, {"max_nulls": max_nulls})

    @staticmethod
    def null_rate_below(column: str, rate: float) -> Expectation:
        return Expectation("null_rate_below", column, {"rate": rate})

    @staticmethod
    def range(
        column: str, *, lo: Any = None, hi: Any = None, max_violations: int = 0
    ) -> Expectation:
        return Expectation(
            "range", column, {"lo": lo, "hi": hi, "max_violations": max_violations}
        )

    @staticmethod
    def regex(column: str, pattern: str, *, max_violations: int = 0) -> Expectation:
        return Expectation(
            "regex", column, {"pattern": pattern, "max_violations": max_violations}
        )

    @staticmethod
    def isin(column: str, values: list, *, max_violations: int = 0) -> Expectation:
        return Expectation(
            "isin", column, {"values": list(values), "max_violations": max_violations}
        )

    @staticmethod
    def unique(column, *, max_dup_rows: int = 0) -> Expectation:
        cols = [column] if isinstance(column, str) else list(column)
        return Expectation("unique", ",".join(cols), {"columns": cols, "max_dup_rows": max_dup_rows})

    @staticmethod
    def ref(
        column: str, dim: DataFrame, dim_key: str, *, max_violations: int = 0
    ) -> Expectation:
        return Expectation(
            "ref", column, {"dim": dim, "dim_key": dim_key, "max_violations": max_violations}
        )

    @staticmethod
    def psi_below(
        column: str,
        ref_df: DataFrame,
        threshold: float,
        *,
        bins: int = 20,
        lo: float | None = None,
        hi: float | None = None,
    ) -> Expectation:
        return Expectation(
            "psi_below",
            column,
            {"ref": ref_df, "threshold": threshold, "bins": bins, "lo": lo, "hi": hi},
        )


_ROW_LOCAL = {"not_null", "null_rate_below", "range", "regex", "isin"}

REPORT_COLS = ["check", "column", "metric", "threshold", "passed"]


class Suite:
    def __init__(self, expectations: list[Expectation]):
        self.expectations = list(expectations)

    # -- row-local tier: ONE fused aggregate ------------------------------

    def _row_local_report(self, df: DataFrame, exps: list[Expectation]) -> DataFrame | None:
        if not exps:
            return None
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, e in enumerate(exps):
            c, p = F.col(e.column), e.params
            if e.kind == "not_null" or e.kind == "null_rate_below":
                bad = c.isNull()
            elif e.kind == "range":
                bad = F.lit(False)
                if p["lo"] is not None:
                    bad = bad | (c < F.lit(p["lo"]))
                if p["hi"] is not None:
                    bad = bad | (c > F.lit(p["hi"]))
                bad = c.isNotNull() & bad
            elif e.kind == "regex":
                bad = c.isNotNull() & ~c.rlike(p["pattern"])
            elif e.kind == "isin":
                bad = c.isNotNull() & ~c.isin(p["values"])
            aggs.append(F.sum(bad.cast("long")).alias(f"__m_{i}"))
        wide = df.agg(*aggs)
        rows = []
        for i, e in enumerate(exps):
            p = e.params
            m = F.col(f"__m_{i}").cast("double")
            if e.kind == "null_rate_below":
                metric = m / F.col("__n")
                threshold = F.lit(float(p["rate"]))
                passed = metric < threshold
            else:
                key = {
                    "not_null": "max_nulls",
                    "range": "max_violations",
                    "regex": "max_violations",
                    "isin": "max_violations",
                }[e.kind]
                metric = m
                threshold = F.lit(float(p[key]))
                passed = metric <= threshold
            rows.append(
                F.struct(
                    F.lit(e.kind).alias("check"),
                    F.lit(e.column).alias("column"),
                    F.round(metric, 6).alias("metric"),
                    threshold.alias("threshold"),
                    passed.alias("passed"),
                )
            )
        return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")

    # -- whole-table tier: bounded-output jobs ----------------------------

    def _whole_table_report(self, df: DataFrame, e: Expectation) -> DataFrame:
        spark = df.sparkSession
        p = e.params
        if e.kind == "unique":
            from vldt_spark.checks.uniqueness import duplicate_keys

            dups = duplicate_keys(df, p["columns"])
            n_dup_rows = (
                dups.agg(F.coalesce(F.sum("n_dups"), F.lit(0)).cast("double")).first()[0]
            )
            metric, thr = float(n_dup_rows), float(p["max_dup_rows"])
            passed = metric <= thr
        elif e.kind == "ref":
            from vldt_spark.checks.referential import ri_report

            rep = ri_report(df, e.column, p["dim"], p["dim_key"])
            n_bad = rep.agg(
                F.coalesce(F.sum("n_rows"), F.lit(0)).cast("double")
            ).first()[0]
            metric, thr = float(n_bad), float(p["max_violations"])
            passed = metric <= thr
        elif e.kind == "psi_below":
            from vldt_spark.checks.drift import histogram, psi

            lo, hi = p["lo"], p["hi"]
            if lo is None or hi is None:
                row = p["ref"].agg(F.min(e.column), F.max(e.column)).first()
                lo = float(row[0]) if lo is None else lo
                hi = float(row[1]) if hi is None else hi
            h_ref = histogram(p["ref"], e.column, bins=p["bins"], lo=lo, hi=hi)
            h_cur = histogram(df, e.column, bins=p["bins"], lo=lo, hi=hi)
            metric, thr = psi(h_ref, h_cur), float(p["threshold"])
            passed = metric < thr
        else:  # pragma: no cover
            raise ValueError(f"unknown expectation kind {e.kind}")
        return spark.createDataFrame(
            [(e.kind, e.column, round(float(metric), 6), thr, bool(passed))],
            "check string, column string, metric double, threshold double, passed boolean",
        )

    def run(self, df: DataFrame) -> DataFrame:
        """Evaluate every expectation; returns the report DataFrame
        (check, column, metric, threshold, passed) in declaration order
        grouping: row-local rows first (one fused pass), then whole-table
        rows."""
        row_local = [e for e in self.expectations if e.kind in _ROW_LOCAL]
        whole = [e for e in self.expectations if e.kind not in _ROW_LOCAL]
        parts = []
        rl = self._row_local_report(df, row_local)
        if rl is not None:
            parts.append(rl)
        parts.extend(self._whole_table_report(df, e) for e in whole)
        if not parts:
            return df.sparkSession.createDataFrame(
                [], "check string, column string, metric double, threshold double, passed boolean"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def passed(self, df: DataFrame) -> bool:
        """True iff every expectation holds (the CI-gate boolean)."""
        return self.run(df).agg(F.min("passed")).first()[0] is True
