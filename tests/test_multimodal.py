"""Multimodal binary-column plumbing tests (decode stubbed, shapes real)."""

from pyspark.sql import functions as F

from vldt_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    frame_sample_stub,
    synthetic_media,
)


def test_extract_features_shapes_and_determinism(spark):
    media = synthetic_media(spark, 30)
    out = extract_features(media)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 30
    # payloads are the utf-8 bytes of the sha2-512 hex digest: 128 bytes
    assert all(r["n_bytes"] == 128 for r in rows.values())
    assert all(len(r["feature"]) == 8 for r in rows.values())
    # deterministic end-to-end: same input -> identical features
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again["media-000003"] == rows["media-000003"]["feature"]
    # first feature component is the byte length
    assert rows["media-000000"]["feature"][0] == 128.0


def test_extract_features_null_payload(spark):
    media = synthetic_media(spark, 5).withColumn(
        "payload",
        F.when(F.col("media_id") == "media-000002", F.lit(None).cast("binary")).otherwise(
            F.col("payload")
        ),
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows["media-000002"]["n_bytes"] == 0
    assert all(v == 0.0 for v in rows["media-000002"]["feature"])


def test_frame_sampling_explode(spark):
    media = synthetic_media(spark, 30)
    frames = frame_sample_stub(media, every_ms=1000)
    # only video rows expand; duration 5000ms -> 5 frames each
    n_videos = media.where(F.col("kind") == "video").count()
    assert frames.count() == n_videos * 5
    one = frames.where(F.col("media_id") == frames.first()["media_id"])
    ts = sorted(r["frame_ts_ms"] for r in one.collect())
    assert ts == [0, 1000, 2000, 3000, 4000]


def test_resize_stub_shapes(spark):
    from vldt_spark.functions.multimodal import resize_stub

    media = synthetic_media(spark, 10)
    out = resize_stub(media, width=8, height=8)
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(r["payload"]) == 64 for r in rows)  # 8x8 deterministic bytes
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    # deterministic: same input -> identical resized payloads
    again = {r["media_id"]: r["payload"] for r in resize_stub(media, width=8, height=8).collect()}
    assert again[rows[0]["media_id"]] == rows[0]["payload"]


def test_parse_media_headers_real_formats(spark):
    """REAL header decode: PNG IHDR / JPEG SOF0 / WAV fmt+data parsed with
    int.from_bytes against payloads written by the independent struct.pack
    synthesizer; malformed payloads degrade to nulls, never crash."""
    from pyspark.sql import functions as F

    from vldt_spark.functions.multimodal import (
        parse_media_headers,
        synthesize_header_payloads,
    )

    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    parsed = parse_media_headers(synthesize_header_payloads(ids))
    rows = {int(r["media_id"]): r for r in parsed.collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        if i % 3 == 0:
            assert r["fmt"] == "png"
            assert r["parsed_width"] == 16 + i % 317
            assert r["parsed_height"] == 16 + i % 211
        elif i % 3 == 1:
            assert r["fmt"] == "jpeg"
            assert r["parsed_width"] == 16 + i % 317
            assert r["parsed_height"] == 16 + i % 211
        else:
            assert r["fmt"] == "wav"
            assert r["parsed_duration_ms"] == 1000 + i % 4000

    # malformed payloads: junk, truncated PNG, empty, null
    bad = spark.createDataFrame(
        [
            ("j1", bytearray(b"not a media file at all")),
            ("j2", bytearray(b"\x89PNG\r\n\x1a\nXX")),
            ("j3", bytearray(b"")),
            ("j4", None),
        ],
        "media_id string, payload binary",
    )
    got = {r["media_id"]: r for r in parse_media_headers(bad).collect()}
    assert got["j1"]["fmt"] is None
    assert got["j2"]["fmt"] == "png" and got["j2"]["parsed_width"] is None
    assert got["j3"]["fmt"] is None and got["j4"]["fmt"] is None


def test_parse_one_header_never_raises_on_arbitrary_bytes():
    """Fuzz the byte parser driver-side: arbitrary (including adversarially
    prefixed) payloads must degrade to nulls, never raise — at 100 TB every
    malformed file that exists will be seen."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vldt_spark.functions.multimodal import _parse_one_header

    prefixes = st.sampled_from(
        [b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"RIFF1234WAVE", b"RIFFxxxx"]
    )

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(st.none(), st.tuples(prefixes, st.binary(max_size=64))))
    def run(payload):
        b = None if payload is None else payload[0] + payload[1]
        fmt, w, h, d = _parse_one_header(b)
        assert fmt in (None, "png", "jpeg", "wav")
        for v in (w, h):
            assert v is None or (isinstance(v, int) and v >= 0)
        assert d is None or isinstance(d, int)

    run()


def test_jpeg_fill_bytes_before_marker_parse():
    """ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker —
    a padded SOF0 must still yield dimensions."""
    import struct

    from vldt_spark.functions.multimodal import _parse_one_header

    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 99, 123) + b"\x03" + bytes(9)
    padded = b"\xff\xd8" + b"\xff\xff\xff" + sof0[1:] + b"\xff\xd9"
    fmt, w, h, d = _parse_one_header(padded)
    assert (fmt, w, h) == ("jpeg", 123, 99)
