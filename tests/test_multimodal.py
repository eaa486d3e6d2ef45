"""Multimodal plumbing: schemas, batch shapes, stub behavior."""

import pytest
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.multimodal import (
    attach_payload,
    decode_image_meta,
    resize_images,
    sample_audio_frames,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def payloads(spark):
    return attach_payload(load_table(spark, SF_SMOKE, "documents"))


def test_decode_meta_deterministic(spark, payloads):
    a = decode_image_meta(payloads).orderBy("doc_id").collect()
    b = decode_image_meta(payloads).orderBy("doc_id").collect()
    assert a == b
    assert all(64 <= r.width < 576 and 64 <= r.height < 576 for r in a)
    n = payloads.count()
    assert len(a) == n


def test_resize_preserves_schema_and_bounds(spark, payloads):
    out = resize_images(payloads, max_side=16)
    assert out.schema == payloads.schema
    assert out.select(F.max(F.length("payload"))).first()[0] <= 64


def test_audio_frames_fan_out(spark, payloads):
    frames = sample_audio_frames(payloads)
    per = frames.groupBy("doc_id").count()
    docs = payloads.withColumn("n", F.length("payload"))
    joined = per.join(docs, "doc_id").collect()
    for r in joined:
        assert r["count"] == max(1, r.n // 100)


def test_real_mode_is_clearly_stubbed(spark, payloads):
    with pytest.raises(Exception, match="STUB.*PIL"):
        decode_image_meta(payloads, fake=False).collect()


# ----------------------------------------------------- real-mode codecs
def _p6(w, h, seed=7):
    body = bytes((i * seed + 13) % 256 for i in range(w * h * 3))
    return f"P6\n# comment\n{w} {h}\n255\n".encode() + body


def _bmp(w, h):
    import struct

    row = (w * 3 + 3) // 4 * 4
    return struct.pack(
        "<2sIHHIIii", b"BM", 54 + row * h, 0, 0, 54, 40, w, h
    ) + b"\x00" * (28 + row * h)


def _wav(n_frames, rate=8000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x01\x02" * n_frames)
    return buf.getvalue()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, _p6(20, 10)),
        (2, _p6(300, 150)),
        (3, _bmp(33, 21)),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_real_decode_ppm_and_bmp_headers(spark, media):
    got = {
        r.doc_id: (r.mime, r.width, r.height)
        for r in decode_image_meta(media, fake=False).collect()
    }
    assert got[1] == ("image/x-portable-pixmap", 20, 10)
    assert got[2] == ("image/x-portable-pixmap", 300, 150)
    assert got[3] == ("image/bmp", 33, 21)


def test_real_resize_p6_nearest_neighbor(spark, media):
    out = resize_images(
        media.filter(F.col("doc_id") < 3), max_side=64, fake=False
    )
    metas = {
        r.doc_id: (r.width, r.height)
        for r in decode_image_meta(out, fake=False).collect()
    }
    assert metas[1] == (20, 10)  # within bounds: untouched
    assert metas[2] == (64, 32)  # 300x150 -> 64x32, aspect preserved
    # the resized payload is itself a well-formed P6 of exactly w*h*3
    raw = {
        r.doc_id: bytes(r.payload) for r in out.collect()
    }[2]
    header_end = raw.index(b"255\n") + 4
    assert len(raw) - header_end == 64 * 32 * 3


def test_real_wav_framing(spark):
    # 8000 Hz, 2.5 s => 20000 frames; 1000 ms slices => 3 slices
    df = spark.createDataFrame(
        [(9, _wav(20000))], "doc_id long, payload binary"
    )
    rows = sorted(
        sample_audio_frames(df, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.offset_ms, r.n_bytes) for r in rows] == [
        (0, 0, 16000),  # 8000 frames x 1 ch x 2 B
        (1, 1000, 16000),
        (2, 2000, 8000),  # 4000 remaining frames
    ]


def test_real_mode_unknown_codecs_raise(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\nxxxx")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="STUB.*PIL"):
        decode_image_meta(df, fake=False).collect()
    with pytest.raises(Exception, match="STUB.*pyav|STUB.*libsndfile"):
        sample_audio_frames(df, fake=False).collect()


def test_real_mode_malformed_ppm_header_is_named(spark):
    """A 'P6' magic whose header lacks the width/height tokens must
    fail with a ValueError naming the malformed payload, not an
    executor-opaque IndexError (ADVICE r3)."""
    bad = spark.createDataFrame(
        [(1, bytearray(b"P6  "))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="malformed PPM"):
        decode_image_meta(bad, fake=False).collect()
