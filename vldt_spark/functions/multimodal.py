"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is stubbed behind
``decode_stub`` because image/audio libraries are not in this container —
swap ``_decode_image_batch``'s body for PIL/torchvision and the pipeline
is production-shaped. Batches flow through ``mapInPandas`` so each Arrow
batch carries the binary payloads zero-copy to the Python worker.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_batch(payloads: pd.Series) -> np.ndarray:
    """STUB: deterministic fake decode — real impl would be
    ``PIL.Image.open(io.BytesIO(b))`` + resize + ``np.asarray``.

    The fake maps each payload to a fixed-size feature derived from byte
    statistics, so tests exercise exact batch shapes end-to-end."""
    feats = np.zeros((len(payloads), 8), dtype=np.float32)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        feats[i] = [
            len(arr),
            float(arr.mean()),
            float(arr.std()),
            float(arr.min()),
            float(arr.max()),
            float(arr[: len(arr) // 2].mean()) if len(arr) > 1 else 0.0,
            float(arr[len(arr) // 2 :].mean()) if len(arr) > 1 else 0.0,
            float((arr.astype(np.int64) ** 2).mean()),
        ]
    return feats


def extract_features(media: DataFrame, *, batch_note: str = "image") -> DataFrame:
    """Binary payloads → fixed-size features via mapInPandas (Arrow batches).

    Partition sizing note for 100 TB: binary payloads dominate batch memory;
    callers should set ``spark.sql.files.maxPartitionBytes`` (or repartition)
    so a single Arrow batch of payloads fits the Python worker — the
    transform itself is embarrassingly parallel, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_stub(media: DataFrame, *, width: int = 32, height: int = 32) -> DataFrame:
    """Image-resize plumbing: STUB decode/resample (real impl:
    ``PIL.Image.open(...).resize((w, h))``) — the fake deterministically
    downsamples the payload bytes to ``w*h`` by strided selection so batch
    shapes, output schema, and the mapInPandas Arrow path are all real.
    Embarrassingly parallel, no shuffle; payload bytes never leave the
    executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out_payloads = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    out_payloads.append(None)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                idx = np.linspace(0, len(arr) - 1, num=target).astype(np.int64)
                out_payloads.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_stub(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: expands each video row into frame
    timestamps (real impl would decode frames with pyav/ffmpeg). The
    explode + downstream partitioning is the real scale concern and is
    exercised here; the pixel decode is the stub."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def synthetic_media(spark, n: int = 100, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived
    from hashes — no external data)."""
    df = spark.range(n)
    payload = F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 512).cast("binary")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    return df.select(
        F.format_string("media-%06d", F.col("id")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.when(kind == "video", F.lit(5000).cast("long")).alias("duration_ms"),
    )
