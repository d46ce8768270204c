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


HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("parsed_width", T.IntegerType(), True),
        T.StructField("parsed_height", T.IntegerType(), True),
        T.StructField("parsed_duration_ms", T.LongType(), True),
    ]
)


def _parse_one_header(b: bytes | None):
    """REAL container-header parse, zero deps (numpy/int.from_bytes only):

      PNG  — 8-byte signature, IHDR width/height as big-endian u32 at
             byte offsets 16/20 (PNG spec §5.2/§11.2.2)
      JPEG — marker scan to SOF0/SOF1/SOF2; height/width big-endian u16
             at +5/+7 inside the frame header (ITU T.81 §B.2.2)
      WAV  — RIFF/WAVE 'fmt ' chunk byte_rate (LE u32) + 'data' chunk
             size → duration_ms = data_size * 1000 // byte_rate

    Returns (fmt, width, height, duration_ms) with Nones for anything
    unparseable — malformed payloads are a validation OUTCOME (header_ok
    false), never an executor crash."""
    if b is None or len(b) < 2:
        return (None, None, None, None)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 24 and b[12:16] == b"IHDR":
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return ("png", w, h, None)
        return ("png", None, None, None)
    if b[:2] == b"\xff\xd8":
        i = 2
        n = len(b)
        while i < n - 1:
            if b[i] != 0xFF:
                break
            j = i + 1
            while j < n and b[j] == 0xFF:
                j += 1  # 0xFF fill bytes before a marker are legal padding
                # (ITU T.81 §B.1.1.2) — skip them or a padded SOF misparses
            if j >= n:
                break
            marker = b[j]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                if j + 8 <= n:
                    h = int.from_bytes(b[j + 4 : j + 6], "big")
                    w = int.from_bytes(b[j + 6 : j + 8], "big")
                    return ("jpeg", w, h, None)
                break
            if marker == 0xD9:  # EOI
                break
            if 0xD0 <= marker <= 0xD8 or marker in (0x00, 0x01):  # standalone
                i = j + 1
                continue
            if j + 3 > n:
                break
            seglen = int.from_bytes(b[j + 1 : j + 3], "big")
            if seglen < 2:
                break
            i = j + 1 + seglen
        return ("jpeg", None, None, None)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i = 12
        n = len(b)
        byte_rate = None
        data_size = None
        while i + 8 <= n:
            cid = b[i : i + 4]
            csize = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 24 <= n:
                byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            elif cid == b"data":
                # declared size, not bytes-present: a truncated payload
                # still reports the encoded duration (and a separate
                # size check can flag the truncation)
                data_size = csize
            if byte_rate is not None and data_size is not None:
                break
            i += 8 + csize + (csize & 1)  # RIFF chunks are word-aligned
        if byte_rate and data_size is not None:
            return ("wav", None, None, data_size * 1000 // byte_rate)
        return ("wav", None, None, None)
    return (None, None, None, None)


def parse_media_headers(
    media: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Binary payloads → REAL parsed container metadata (fmt, width,
    height, duration) via mapInPandas — the non-stub core of the
    multimodal validation surface: parsed dims can be checked against the
    table's CLAIMED metadata columns, the multimodal analogue of the
    token-array equality invariant. Embarrassingly parallel, no shuffle;
    only (id, 5 small fields) leave the executor per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, ds = [], [], [], []
            for b in pdf[payload_col]:
                fmt, w, h, d = _parse_one_header(
                    bytes(b) if b is not None else None
                )
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                ds.append(d)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "fmt": pd.Series(fmts, dtype=object),
                    "parsed_width": pd.array(ws, dtype="Int32"),
                    "parsed_height": pd.array(hs, dtype="Int32"),
                    "parsed_duration_ms": pd.array(ds, dtype="Int64"),
                }
            )

    return media.select(
        F.col(id_col), F.col(payload_col)
    ).mapInPandas(run, schema=HEADER_SCHEMA)


def synthesize_header_payloads(
    ids: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL container headers from an id column (test/bench
    source — no external data): id % 3 picks png/jpeg/wav; dimensions and
    duration are exact functions of the id, so an oracle can predict what
    ``parse_media_headers`` must recover. Writer uses struct-pack-style
    byte composition; the parser reads with int.from_bytes — two
    independent code paths over the actual byte formats."""
    import struct

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w = 16 + i % 317
                h = 16 + i % 211
                dur_ms = 1000 + i % 4000
                kind = i % 3
                if kind == 0:  # PNG: signature + IHDR
                    b = (
                        b"\x89PNG\r\n\x1a\n"
                        + struct.pack(">I", 13)
                        + b"IHDR"
                        + struct.pack(">II", w, h)
                        + bytes([8, 6, 0, 0, 0])
                        + b"\x00\x00\x00\x00"  # CRC placeholder
                    )
                elif kind == 1:  # JPEG: SOI + APP0 + SOF0 + EOI
                    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
                    sof0 = (
                        b"\xff\xc0"
                        + struct.pack(">H", 17)
                        + b"\x08"
                        + struct.pack(">HH", h, w)
                        + b"\x03"
                        + bytes(9)
                    )
                    b = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
                else:  # WAV: RIFF/WAVE + fmt + data (byte_rate 8000 -> ms exact)
                    byte_rate = 8000
                    data_size = dur_ms * byte_rate // 1000
                    fmt_chunk = b"fmt " + struct.pack(
                        "<IHHIIHH", 16, 1, 1, 8000, byte_rate, 1, 8
                    )
                    b = (
                        b"RIFF"
                        + struct.pack("<I", 36 + data_size)
                        + b"WAVE"
                        + fmt_chunk
                        + b"data"
                        + struct.pack("<I", data_size)
                        # payload bytes intentionally absent: parser must
                        # use the DECLARED size
                    )
                payloads.append(b)
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype(str), "payload": payloads}
            )

    return ids.select(id_col).mapInPandas(run, schema=out_schema)


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
