"""Sequence packing layout for pretraining batches.

The standard LLM data-prep step after filtering/dedup: concatenate
documents into a token stream and cut it every ``max_tokens`` to form
fixed-length training examples. This operator computes the PLACEMENT
(which pack(s) each document lands in, at what offset) without
materializing token streams — the actual gather is then a cheap
group-and-concat over the layout.

Scale shape: documents hash into ``buckets`` independent streams; within
a bucket the order is the deterministic shuffle (key hash, id), and the
running-token cumsum is one window over the bucket partition. The only
shuffle is the exchange on the bucket column, and per-reducer work is
bounded by bucket size — pick buckets so a bucket's documents fit a
task (10^6 buckets at 10^12 docs → ~10^6-row windows). No global sort
ever happens (a single ORDER BY over the corpus would serialize on one
task — the classic packing-at-scale mistake).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vldt_spark.functions.dedup import _hash64


def chunk_layout(
    docs: DataFrame,
    *,
    len_col: str = "n_tok",
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    buckets: int = 1024,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Concat-then-chunk placement (the GPT-style packing model: documents
    straddle pack boundaries; nothing is padded or dropped).

    Returns one row per document with ``len_col > 0``:
      bucket          hash stream the doc concatenates into
      stream_offset   tokens before this doc within its bucket's stream
      pack_first      floor(stream_offset / max_tokens)
      pack_last       pack containing the doc's final token
      offset_in_pack  stream_offset % max_tokens

    Deterministic: bucket and order derive from the key hash alone, so
    the layout survives retries and repartitioning. ``hash_fn="md5"``
    uses the portable hash so the whole layout is value-checkable
    against an ANSI-SQL window oracle."""
    if max_tokens < 1 or buckets < 1:
        raise ValueError(
            f"chunk_layout: max_tokens and buckets must be >= 1, got "
            f"max_tokens={max_tokens}, buckets={buckets}"
        )
    h = _hash64(F.col(id_col).cast("string"), seed, hash_fn)
    base = (
        docs.where(F.col(len_col).isNotNull() & (F.col(len_col) > 0))
        .select(
            F.col(id_col),
            F.col(len_col).cast("long").alias("__len"),
            F.pmod(h, F.lit(buckets)).cast("int").alias("bucket"),
            F.pmod(h, F.lit(1_000_000_007)).alias("__ord"),
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("__ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum("__len").over(w) - F.col("__len")).alias("stream_offset")
    out = base.select(id_col, "bucket", F.col("__len"), cum)
    return out.select(
        id_col,
        "bucket",
        F.col("stream_offset"),
        F.floor(F.col("stream_offset") / max_tokens).cast("long").alias("pack_first"),
        F.floor((F.col("stream_offset") + F.col("__len") - 1) / max_tokens)
        .cast("long")
        .alias("pack_last"),
        (F.col("stream_offset") % max_tokens).alias("offset_in_pack"),
    )
