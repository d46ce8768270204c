"""Scaling-efficiency evidence for the north rule.

The rule requires throughput scaling efficiency ≥ 0.8 going from N to 4N
executors; in this sandbox (no real cluster) the driver-sanctioned proxy is
the same job at two parallelism levels on identical input:
local[8] vs local[32], efficiency = (throughput_32 / throughput_8) / 4.

Each measurement is a fresh JVM (subprocess) so executor-thread pools,
shuffle partitions, and codegen caches don't leak between runs. The
measured job is the full fused validation pass (all row-local checks +
salted uniqueness + RI broadcast-back + verdict aggregation) over the
pre-materialized token table — generation excluded.

Writes results to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEASURE_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["PYTHONPATH"] = {repo!r}
from pyspark.sql import SparkSession
cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "16m")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from vldt_spark.flagship import validate_token_table
from vldt_spark.sources.token_table import sources_dim
toks = spark.read.parquet({tok_path!r})
dims = sources_dim(spark)
# warm-up: JVM/codegen + file listing (excluded from measurement)
toks.limit(1000).count()
best = None
for _ in range({reps}):
    t0 = time.perf_counter()
    res = validate_token_table(toks, dims)
    rows = res.verdicts(["source"]).collect()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
n = sum(r["n_rows"] for r in rows)
print(json.dumps({{"cpus": cpus, "wall_sec": round(best, 3), "n_rows": n,
                   "seqs_per_sec": round(n / best, 1)}}))
spark.stop()
"""


def measure(cpus: int, tok_path: str, reps: int = 2) -> dict:
    code = MEASURE_SNIPPET.format(repo=REPO, cpus=cpus, tok_path=tok_path, reps=reps)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"measurement failed (cpus={cpus}): {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    n_rows = int(os.environ.get("VLDT_SCALING_ROWS", "1000000"))
    tok_path = os.path.join(REPO, ".bench_cache", f"tokens_{n_rows}.parquet")
    if not os.path.exists(os.path.join(tok_path, "_SUCCESS")):
        # materialize once via bench helper
        sys.path.insert(0, REPO)
        import bench

        spark = bench.build_session(16)
        spark.sparkContext.setLogLevel("ERROR")
        bench.ensure_token_table(spark, n_rows)
        spark.stop()

    lo = measure(8, tok_path)
    hi = measure(32, tok_path)
    eff = round((hi["seqs_per_sec"] / lo["seqs_per_sec"]) / 4.0, 3)
    result = {
        "n_rows": n_rows,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency_8_to_32": eff,
        "meets_north_rule_0.8": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (north rule)

Job: full fused validation pass (schema/type/range/regex/cross-field checks
+ salted uniqueness + RI anti-join + per-source verdict aggregation) over a
{n_rows:,}-row deterministic synthetic token table
(BASELINE.json input_hint shape), pre-materialized parquet, generation
excluded. Same input both runs; each run a fresh JVM; best of 2.

| parallelism | wall sec | validated seqs/sec |
|---|---|---|
| local[8]  | {lo['wall_sec']} | {lo['seqs_per_sec']:,} |
| local[32] | {hi['wall_sec']} | {hi['seqs_per_sec']:,} |

**Scaling efficiency (8→32 cores, = N→4N executors proxy):**
(throughput_32 / throughput_8) / 4 = **{eff}**
(north-rule bar: ≥ 0.8 → {"MET" if eff >= 0.8 else "NOT MET"})

Reproduce: `python tools/scaling_bench.py`
(env `VLDT_SCALING_ROWS` to change the row count).
""")


if __name__ == "__main__":
    main()
