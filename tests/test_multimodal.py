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
