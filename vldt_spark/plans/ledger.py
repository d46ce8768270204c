"""B13 — per-partition checkpoint/resume ledger.

The north rule requires interrupted validations to resume idempotently with
per-partition lineage + metrics tables. Without Iceberg jars in-sandbox,
the ledger is a directory-per-partition parquet layout with the same
write-audit-publish shape an Iceberg/Delta writer would use:

    <root>/metrics/part=<value>/   one-row verdict parquet (B11 shape)
    <root>/violations/part=<value>/  exploded violation rows (B12 shape)
    <root>/_ledger/part=<value>.json  commit marker, written LAST

A partition is "done" iff its commit marker exists — markers are written
after both tables land, so a kill between writes re-runs that partition
(overwrite semantics make the re-run idempotent). On a real cluster the
same interface maps to Iceberg's ``overwritePartitions()``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vldt_spark.engine import ValidationEngine, ValidationResult
from vldt_spark.model import Model


class ValidationLedger:
    def __init__(self, root: str, partition_col: str):
        self.root = root
        self.partition_col = partition_col
        os.makedirs(os.path.join(root, "_ledger"), exist_ok=True)

    # -- state ---------------------------------------------------------------

    def _marker(self, value: str) -> str:
        return os.path.join(self.root, "_ledger", f"part={value}.json")

    def completed_partitions(self) -> set[str]:
        d = os.path.join(self.root, "_ledger")
        return {
            f[len("part=") : -len(".json")]
            for f in os.listdir(d)
            if f.startswith("part=") and f.endswith(".json")
        }

    # -- run -----------------------------------------------------------------

    def run(
        self,
        df: DataFrame,
        model: type[Model],
        *,
        id_cols: list[str],
        dims: dict[str, DataFrame] | None = None,
        partitions: Iterable[str] | None = None,
        concurrency: int = 1,
    ) -> dict[str, dict]:
        """Validate partition-by-partition, skipping completed ones.

        Each partition is one filtered job (partition pruning applies when
        the source is partitioned by the same column); its verdict + exploded
        violations are overwritten-by-partition, then the commit marker lands.
        Returns {partition: metrics} for partitions run in this call.

        ``concurrency > 1`` submits that many partition jobs at once from a
        thread pool — useful when individual partitions are small relative
        to the cluster (a single big partition already saturates it, so the
        default stays serial). Commit markers, metrics and violations are
        all per-partition paths, so concurrent partitions never touch the
        same files; the resume contract is unchanged."""
        engine = ValidationEngine(model)
        pcol = self.partition_col
        if partitions is None:
            partitions = [
                r[pcol]
                for r in df.select(pcol).distinct().collect()
                if r[pcol] is not None
            ]
        done = self.completed_partitions()
        todo = [v for v in partitions if str(v) not in done]  # idempotent skip

        def _one(value) -> tuple[str, dict]:
            sval = str(value)
            part_df = df.where(F.col(pcol) == value)
            t0 = time.perf_counter()
            res = engine.run(part_df, id_cols=id_cols, dims=dims)
            verdict = res.verdicts([pcol])
            vio = res.violations()
            mdir = os.path.join(self.root, "metrics", f"part={sval}")
            vdir = os.path.join(self.root, "violations", f"part={sval}")
            verdict.write.mode("overwrite").parquet(mdir)
            vio.write.mode("overwrite").parquet(vdir)
            # read the landed metrics back rather than re-running the
            # verdict computation (one tiny scan vs a full partition pass)
            row = df.sparkSession.read.parquet(mdir).first()
            metrics = {
                "partition": sval,
                "n_rows": row["n_rows"] if row else 0,
                "n_invalid": row["n_invalid"] if row else 0,
                "n_violations": row["n_violations"] if row else 0,
                "passed": bool(row["passed"]) if row else True,
                "wall_sec": round(time.perf_counter() - t0, 3),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            # marker written LAST → crash before this point re-runs the
            # partition; overwrite above makes the re-run idempotent.
            # temp-file + atomic rename: a crash mid-write must never leave
            # a half-written marker that reads as "completed"
            tmp = self._marker(sval) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(metrics, f)
            os.replace(tmp, self._marker(sval))
            return sval, metrics

        if concurrency > 1 and len(todo) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(concurrency, len(todo))) as pool:
                out = dict(pool.map(_one, todo))
        else:
            out = dict(_one(v) for v in todo)
        return out

    # -- read back -------------------------------------------------------------

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "metrics", "part=*"))

    def violations(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "violations", "part=*"))

    def reset(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(os.path.join(self.root, "_ledger"), exist_ok=True)
