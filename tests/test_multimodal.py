"""Multimodal plumbing tests: binary columns, Arrow batch shapes, UDF
signatures, frame slicing (SURVEY north-star; decode is a marked stub)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_migrate_api_spark.operators.multimodal import (
    byte_histogram_features,
    decode_images,
    fake_media_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    return fake_media_table(docs).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert dict(media.dtypes)["meta"].startswith("struct<n_bytes:int")
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}
    # audio/video payload = 4 chained md5s = 64 bytes;
    # image = 33-byte PNG signature+IHDR header ++ the 64-byte payload
    assert media.where(
        (F.col("media_type") != "image") & (F.length("content") != 64)
    ).count() == 0
    assert media.where(
        (F.col("media_type") == "image") & (F.length("content") != 97)
    ).count() == 0


def test_decode_images_real_png_header_parse(media):
    """decode_images must parse the ACTUAL planted PNG IHDR (width/height
    derived from media_id), not derive dims from payload bytes."""
    out = decode_images(media)
    assert out.columns == ["media_id", "width", "height", "mode", "n_bytes"]
    rows = out.collect()
    assert len(rows) == media.where(F.col("media_type") == "image").count()
    for r in rows:
        assert r["width"] == (r["media_id"] % 32 + 1) * 16
        assert r["height"] == (r["media_id"] % 24 + 1) * 16
        assert r["mode"] == "RGB"  # planted color type 2
        assert r["n_bytes"] == 97
    # deterministic: re-run → identical
    again = {r["media_id"]: (r["width"], r["height"]) for r in decode_images(media).collect()}
    assert all(again[r["media_id"]] == (r["width"], r["height"]) for r in rows)


def test_decode_header_formats():
    import struct

    from etl_migrate_api_spark.operators.multimodal import _decode_header

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + bytes([8, 6, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )
    assert _decode_header(png) == (640, 480, "RGBA")
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 320, -240) + b"\x00" * 10
    assert _decode_header(bmp) == (320, 240, "BGR")
    assert _decode_header(b"") == (0, 0, "empty")
    fallback = bytes([3, 7, 2]) + b"\x00" * 10  # unknown container
    assert _decode_header(fallback) == ((3 % 32 + 1) * 16, (7 % 32 + 1) * 16, "RGB")


def test_byte_histogram_features(media):
    out = byte_histogram_features(media).collect()
    assert all(len(r["features"]) == 16 for r in out)
    for r in out[:20]:
        assert abs(sum(r["features"]) - 1.0) < 1e-5


def test_sample_frames_pure_expr(media):
    out = sample_frames(media, frame_bytes=16)
    rows = out.collect()
    n_videos = media.where(F.col("media_type") == "video").count()
    assert len(rows) == n_videos * 4  # 64 bytes / 16
    assert all(len(r["frame"]) == 16 for r in rows)
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}
    # no Python in the plan: frame sampling must not show mapInPandas/Python eval
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
