"""Multimodal plumbing tests: schema, Arrow batch shapes, determinism, and
the stub boundary (NotImplementedError on non-FAKEIMG payloads).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from gtec_etl_spark.operators import multimodal as M


def test_decode_image_shapes_and_determinism(spark):
    media = M.media_table(spark, n=8, width=32, height=24)
    out = M.decode_image(media)
    assert out.columns == ["media_id", "width", "height", "n_pixels", "mean_intensity"]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 8
    assert all(r["width"] == 32 and r["height"] == 24 and r["n_pixels"] == 768 for r in rows.values())
    again = {r["media_id"]: r for r in M.decode_image(media).collect()}
    assert {k: v["mean_intensity"] for k, v in rows.items()} == {
        k: v["mean_intensity"] for k, v in again.items()
    }


def test_resize_composes_with_decode(spark):
    media = M.media_table(spark, n=4, width=32, height=24)
    small = M.resize_image(media, 8, 6)
    decoded = M.decode_image(small)
    rows = decoded.collect()
    assert all(r["width"] == 8 and r["height"] == 6 and r["n_pixels"] == 48 for r in rows)


def test_byte_histogram_features_feed_similarity(spark):
    media = M.media_table(spark, n=6)
    emb = M.byte_histogram_features(media, bins=16)
    rows = emb.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    assert all(abs(sum(r["embedding"]) - 1.0) < 1e-9 for r in rows)


def test_frame_sample_expands_rows(spark):
    media = M.media_table(spark, n=2, width=32, height=32)  # 1024 px + 15B header
    frames = M.frame_sample(media, every_n_bytes=256)
    per = frames.groupBy("media_id").count().collect()
    # 1039 bytes -> 5 chunks (4 full + tail)
    assert all(r["count"] == 5 for r in per)
    offs = [r["offset"] for r in frames.filter(F.col("media_id") == 0).orderBy("frame_no").collect()]
    assert offs == [0, 256, 512, 768, 1024]


def test_stub_boundary_raises_on_real_formats(spark):
    fake_png = bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    media = spark.createDataFrame(
        [(1, "image", fake_png, ("image/png", "mem://x"))], M.MEDIA_SCHEMA
    )
    with pytest.raises(PythonException, match="NotImplementedError|FAKEIMG"):
        M.decode_image(media).collect()
