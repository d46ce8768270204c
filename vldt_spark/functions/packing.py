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


def pack_nextfit(
    docs: DataFrame,
    *,
    len_col: str = "n_tok",
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    buckets: int = 1024,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """NO-SPLIT packing (the SFT/instruction-tuning mode): each document
    is placed WHOLE into a pack; when the next document would overflow
    ``max_tokens`` a new pack starts (next-fit). Documents never straddle
    pack boundaries, so no cross-document attention leakage — the
    complement of ``chunk_layout``'s concat-then-chop.

    Returns one row per document with ``len_col > 0``:
      bucket          hash stream the doc packs into (same deterministic
                      bucket/order derivation as ``chunk_layout``)
      pack_id         0-based pack index within the bucket
      offset_in_pack  tokens before this doc inside its pack
      item_len        the doc's token length (rides along for reports)

    A document LONGER than ``max_tokens`` gets a pack of its own (the
    pack's fill exceeds ``max_tokens``; ``packing_report`` counts these
    as ``oversize_packs``) — next-fit's natural behavior, kept rather
    than silently truncating or dropping.

    Scale shape: next-fit is inherently sequential PER STREAM (each
    placement depends on every prior one), so parallelism comes from the
    ``buckets`` hash streams — same contract as ``chunk_layout``: one
    exchange on the bucket column, then each bucket packs locally in a
    single Arrow-batched pass (``applyInPandas``; a python loop over a
    numpy length array, ~10^7 items/sec/core — pick ``buckets`` so a
    bucket's documents fit a task). No global sort ever happens.
    """
    import numpy as np
    import pandas as pd

    if max_tokens < 1 or buckets < 1:
        raise ValueError(
            f"pack_nextfit: max_tokens and buckets must be >= 1, got "
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
    id_field = base.schema[id_col]
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, bucket int, "
        "pack_id bigint, offset_in_pack bigint, item_len bigint"
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["__ord", id_col], kind="mergesort")
        lens = pdf["__len"].to_numpy(dtype=np.int64)
        n = len(lens)
        pack = np.zeros(n, dtype=np.int64)
        off = np.zeros(n, dtype=np.int64)
        fill = 0
        pid = 0
        for i in range(n):
            l = int(lens[i])
            if fill > 0 and fill + l > max_tokens:
                pid += 1
                fill = 0
            pack[i] = pid
            off[i] = fill
            fill += l
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "bucket": pdf["bucket"].to_numpy(),
                "pack_id": pack,
                "offset_in_pack": off,
                "item_len": lens,
            }
        )

    return base.groupBy("bucket").applyInPandas(fit, schema=out_schema)


def packing_report(
    layout: DataFrame, *, max_tokens: int, len_col: str = "item_len"
) -> DataFrame:
    """One-row efficiency report over a ``pack_nextfit`` layout: pack
    count, padding tokens (capacity unused in non-oversize packs),
    fill efficiency, oversize-pack count, docs per pack. Two bounded
    aggregations — (bucket, pack_id) partials, then scalars; the
    layout relation shuffles once on keys it already carries."""
    packs = layout.groupBy("bucket", "pack_id").agg(
        F.sum(len_col).alias("fill"), F.count(F.lit(1)).alias("n_docs")
    )
    return packs.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("fill").alias("total_tokens"),
        F.sum(F.greatest(F.lit(max_tokens) - F.col("fill"), F.lit(0)))
        .alias("pad_tokens"),
        F.round(
            F.sum(F.least(F.col("fill"), F.lit(max_tokens))).cast("double")
            / (F.count(F.lit(1)) * max_tokens),
            6,
        ).alias("fill_efficiency"),
        F.sum(
            F.when(F.col("fill") > max_tokens, F.lit(1)).otherwise(F.lit(0))
        ).alias("oversize_packs"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs_per_pack"),
    )
