"""As-of (most-recent-match) join — the temporal operator Spark lacks.

For every left row, attach the single right row with the greatest
``right_ts`` ≤ ``left_ts`` within the same key group (backward as-of,
inclusive on equality) — point-in-time feature lookup, trade/quote
matching, attribution ("the last click before this purchase").

Spark-first plan (NOT a range join):
- The naive SQL form — ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` +
  row_number — EXPLODES: every left row pairs with its entire key history
  before the filter, so a key with h right rows costs |left_k| × h join
  rows (at 10^12 events this is quadratic in history length).  That form
  is kept only as the DuckDB oracle (DuckDB's native ASOF JOIN).
- Here instead: tag both sides, UNION them, and run ONE window pass per
  key ordered by (ts, side, payload) taking ``last(right_payload,
  ignorenulls)`` over rows-unbounded-preceding.  EXACTLY ONE exchange
  (the key hash-partitioning both sides already need) + an in-partition
  sort; no row ever pairs with more than its answer.  This is the
  canonical distributed as-of (same shape Flink/kdb use) and it survives
  100 TB: the exchange carries |left| + |right| rows once, never their
  product.
- Same-instant right duplicates need no pre-aggregation (which would be
  a second shuffle): the payload struct itself is the ordering tiebreak,
  so among right rows sharing (key, ts) the lexicographically greatest
  payload sorts last and is the one ``last()`` picks — a deterministic,
  documented tie-break with zero extra plan nodes.  (Payload columns
  must therefore be orderable types — no maps.)
- The payload rides inside ONE struct column so a NULL payload FIELD in a
  matched right row is preserved (``last(ignorenulls)`` skips NULL
  values; the struct wrapper is non-null whenever a right row exists).

``tolerance`` (seconds) optionally voids matches older than
``left_ts - tolerance`` — the stale-feature guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left columns + ``{prefix}ts`` (the matched right
    timestamp, NULL when no match exists) + ``{prefix}<col>`` for every
    payload column in ``right_cols`` (default: all right columns except
    the key and timestamp).

    ``direction="backward"`` (default) matches the greatest right_ts ≤
    left_ts; ``"forward"`` matches the SMALLEST right_ts ≥ left_ts ("the
    next fill after this order") — same single-exchange window plan run
    over descending time, with the payload tie-break mirrored so equal-
    instant duplicates still resolve to the lexicographic max."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"__ts", "__r", "__side", "__m"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        # a silent duplicate column would make the window ordering
        # ambiguous (Spark resolves names case-insensitively) — fail loud
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    back = direction == "backward"
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]

    r = right.select(
        key,
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c) for c in right_cols],
        ).alias("__r"),
        F.lit(0).alias("__side"),
    )

    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Order: time (descending for forward), then right-before-left at
    # equal instants (inclusive match), then the payload struct ASCENDING
    # — in either time direction the frame ends at the left row, so the
    # LAST right row of a same-instant duplicate group is the one last()
    # picks, and ascending payload puts the lexicographic max there.
    ts_ord = F.col("__ts").asc() if back else F.col("__ts").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_ord, F.col("__side").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    if tolerance is not None:
        lim = F.expr(f"INTERVAL {tolerance} SECOND")
        fresh = (
            F.col("__m")["ts"] >= F.col("__ts") - lim
            if back
            else F.col("__m")["ts"] <= F.col("__ts") + lim
        )
        matched = matched.withColumn("__m", F.when(fresh, F.col("__m")))

    return matched.select(
        *left.columns,
        F.col("__m")["ts"].alias(f"{prefix}ts"),
        *[F.col("__m")[c].alias(f"{prefix}{c}") for c in right_cols],
    )
