"""Zero-dependency AVI/MJPEG video container codec.

Motion-JPEG in an AVI RIFF container is the one mainstream video format
that needs no inter-frame codec: each frame is a standalone baseline
JPEG, which `jpegcodec.py` already decodes with numpy + stdlib.  That
makes REAL video frame extraction (not a stub) possible in this
container-less environment:

- `encode_avi_mjpeg(frames, fps)` writes a spec-shaped RIFF 'AVI ' file
  (hdrl with avih/strh/strf, movi with '00dc' chunks, idx1 index) whose
  entropy payload is real Huffman-coded JPEG bytes.
- `iter_avi_frames(data)` walks the RIFF tree, yields
  (frame_index, jpeg_bytes) from the movi list ('00dc'/'00db' chunks,
  word-aligned), tolerant of a missing idx1.

Scale note: frame extraction parallelizes across VIDEOS via mapInPandas
(multimodal.frame_stats); within one payload the chunk walk is O(bytes)
with no decompression until a frame is selected, so sample-every-N only
pays JPEG decode for the sampled frames.

Format references: Microsoft RIFF/AVI specification (public), ITU-T
T.81 for the frame payloads.  Reference repo has no media surface
(vldt is schema validation only); this comes from the builder's
LLM-pipeline brief.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from vldt_spark.functions.jpegcodec import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], *, fps: int = 10, quality: int = 50
) -> bytes:
    """RIFF 'AVI ' bytes for a list of HxWxC uint8 frames (all the same
    shape), each stored as a real baseline JPEG '00dc' chunk."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    bufsize = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # usec per frame
        bufsize * fps,  # max bytes/sec (approx)
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # initial frames
        1,  # streams
        bufsize,
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0,  # flags
            0,  # priority
            0,  # language
            0,  # initial frames
            1,  # scale
            max(fps, 1),  # rate
            0,  # start
            len(frames),  # length
            bufsize,  # suggested buffer size
            0xFFFFFFFF & (2**32 - 1),  # quality (default)
            0,  # sample size
            0, 0, int(w), int(h),  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # planes
        24,  # bit count
        b"MJPG",
        len(frames[0].tobytes()),  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_payload) + 4)  # offset within movi data
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(j))
            for off, j in zip(offsets, jpegs)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_avi_frames(data: bytes | None) -> Iterator[tuple[int, bytes]]:
    """Yield (frame_index, jpeg_bytes) for each video chunk in the movi
    list.  Malformed/truncated containers yield what they can and stop —
    never raise (degrade-to-null contract)."""
    if data is None or len(data) < 12 or data[:4] != b"RIFF":
        return
    if data[8:12] != b"AVI ":
        return
    try:
        idx = 0
        pos = 12
        end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            if fourcc == b"LIST":
                ltype = data[pos + 8 : pos + 12]
                if ltype == b"movi":
                    inner = pos + 12
                    inner_end = min(pos + 8 + size, end)
                    while inner + 8 <= inner_end:
                        cc = data[inner : inner + 4]
                        sz = struct.unpack("<I", data[inner + 4 : inner + 8])[0]
                        payload_end = inner + 8 + sz
                        if payload_end > inner_end:
                            return  # truncated chunk
                        if cc[2:4] in (b"dc", b"db"):
                            yield idx, data[inner + 8 : payload_end]
                            idx += 1
                        inner = payload_end + (sz % 2)
                    pos = pos + 8 + size + (size % 2)
                    continue
            pos = pos + 8 + size + (size % 2)
    except Exception:
        return


def decode_avi_frames(
    data: bytes | None, *, every_n: int = 1
) -> list[tuple[int, "np.ndarray"]]:
    """Decode every `every_n`-th MJPEG frame to pixels.  Skipped frames
    never pay JPEG decode; undecodable frames are dropped."""
    out = []
    for i, jpeg in iter_avi_frames(data):
        if i % every_n:
            continue
        px = decode_jpeg(jpeg)
        if px is not None:
            out.append((i, px))
    return out
