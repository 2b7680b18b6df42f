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
    # payload = 4 chained md5s = 64 bytes; image = 33-byte PNG
    # signature+IHDR ++ payload; audio = 44-byte WAV header ++ payload
    assert media.where(
        (F.col("media_type") == "video") & (F.length("content") != 64)
    ).count() == 0
    assert media.where(
        (F.col("media_type") == "audio") & (F.length("content") != 108)
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


# --- real pixel decode -----------------------------------------------------


def _make_png(width, height, pixels, color_type=2, filters=None):
    """Minimal PNG encoder for fixtures: 8-bit, non-interlaced. ``pixels``
    is raw channel-interleaved bytes; ``filters`` optionally applies a
    per-row filter type (testing the unfilter paths)."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * ch

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        f = filters[y]
        raw.append(f)
        if f == 0:
            raw += row
        elif f == 1:  # Sub
            raw += bytes(
                (row[x] - (row[x - ch] if x >= ch else 0)) & 0xFF
                for x in range(stride)
            )
        elif f == 2:  # Up
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:  # Average
            raw += bytes(
                (row[x] - (((row[x - ch] if x >= ch else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(stride)
            )
        elif f == 4:  # Paeth
            out = bytearray()
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((row[x] - pred) & 0xFF)
            raw += out
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _make_bmp(width, height, bgr):
    """24-bit uncompressed BMP, bottom-up rows, 4-byte row padding."""
    import struct

    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    body = b"".join(
        bgr[y * width * 3 : (y + 1) * width * 3] + pad
        for y in reversed(range(height))
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + body


def test_png_pixel_decode_all_filters_exact():
    """PNG decode must reproduce the exact pixel bytes through every
    scanline filter type (None/Sub/Up/Average/Paeth)."""
    import zlib

    from etl_migrate_api_spark.operators.multimodal import decode_pixels_one

    w, h = 5, 5
    pixels = bytes((x * 37 + 11) % 256 for x in range(w * h * 3))
    for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4]):
        png = _make_png(w, h, pixels, color_type=2, filters=filters)
        dw, dh, mode, px = decode_pixels_one(png)
        assert (dw, dh, mode) == (w, h, "RGB"), filters
        assert px == pixels, f"pixel mismatch with filters {filters}"
        assert zlib.crc32(px) == zlib.crc32(pixels)


def test_png_grayscale_and_rgba():
    from etl_migrate_api_spark.operators.multimodal import decode_pixels_one

    gray = bytes(range(16))
    dw, dh, mode, px = decode_pixels_one(_make_png(4, 4, gray, color_type=0))
    assert (dw, dh, mode, px) == (4, 4, "L", gray)
    rgba = bytes((x * 7) % 256 for x in range(3 * 2 * 4))
    dw, dh, mode, px = decode_pixels_one(_make_png(3, 2, rgba, color_type=6, filters=[4, 2]))
    assert (dw, dh, mode, px) == (3, 2, "RGBA", rgba)


def test_bmp_pixel_decode_exact():
    from etl_migrate_api_spark.operators.multimodal import decode_pixels_one

    w, h = 3, 2  # stride 9 → padded to 12: exercises row padding
    bgr = bytes((x * 19 + 5) % 256 for x in range(w * h * 3))
    dw, dh, mode, px = decode_pixels_one(_make_bmp(w, h, bgr))
    assert (dw, dh, mode) == (w, h, "BGR")
    assert px == bgr  # decoder restores top-down row order


def test_ppm_pgm_pixel_decode_exact():
    from etl_migrate_api_spark.operators.multimodal import decode_pixels_one

    rgb = bytes((x * 3) % 256 for x in range(2 * 2 * 3))
    ppm = b"P6\n# a comment\n2 2\n255\n" + rgb
    assert decode_pixels_one(ppm) == (2, 2, "RGB", rgb)
    gray = bytes([0, 128, 255, 7])
    pgm = b"P5 2 2 255 " + gray
    assert decode_pixels_one(pgm) == (2, 2, "L", gray)


def test_decode_pixels_mapinpandas_exact_crc(spark):
    """End-to-end through the Spark plan: exact pixel CRCs for decodable
    blobs, honest (ok=false, err) rows for corrupt/unsupported ones."""
    import zlib

    w, h = 4, 3
    pixels = bytes((x * 13 + 1) % 256 for x in range(w * h * 3))
    png = _make_png(w, h, pixels, color_type=2, filters=[4, 1, 3])
    bgr = bytes((x * 29) % 256 for x in range(2 * 2 * 3))
    bmp = _make_bmp(2, 2, bgr)
    ppm_px = bytes([9, 8, 7, 6, 5, 4])
    ppm = b"P6\n2 1\n255\n" + ppm_px
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16  # PIL absent → NotImplementedError
    junk = b"\x00\x01\x02\x03not an image"
    df = spark.createDataFrame(
        [(1, "image", png), (2, "image", bmp), (3, "image", ppm),
         (4, "image", jpeg), (5, "image", junk)],
        "media_id long, media_type string, content binary",
    )
    from etl_migrate_api_spark.operators.multimodal import decode_pixels

    out = {r["media_id"]: r for r in decode_pixels(df).collect()}
    assert out[1]["ok"] and out[1]["px_crc32"] == zlib.crc32(pixels)
    assert (out[1]["width"], out[1]["height"], out[1]["mode"]) == (w, h, "RGB")
    assert out[2]["ok"] and out[2]["px_crc32"] == zlib.crc32(bgr)
    assert out[3]["ok"] and out[3]["px_crc32"] == zlib.crc32(ppm_px)
    assert out[3]["mean_px"] == sum(ppm_px) / len(ppm_px)
    assert not out[4]["ok"] and "PIL" in out[4]["err"]
    assert not out[5]["ok"] and "unknown image container" in out[5]["err"]


# --- real audio decode -----------------------------------------------------


def _make_wav(samples, rate=8000, bits=16, n_ch=1, extra_chunk=False):
    """Minimal RIFF/WAVE writer: PCM, optional junk chunk before fmt
    (exercises the chunk walk), word-aligned."""
    import struct

    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = bytes(samples)
    else:
        data = struct.pack(f"<{len(samples)}i", *samples)
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    chunks = b""
    if extra_chunk:
        junk = b"junkdata!"  # odd length: forces the word-align skip
        chunks += b"JUNK" + struct.pack("<I", len(junk)) + junk + b"\x00"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_exact():
    import math

    from etl_migrate_api_spark.operators.multimodal import decode_wav_one

    samples = [0, 16384, -16384, 32767, -32768, 0]
    n_ch, rate, bits, n_frames, pcm = decode_wav_one(
        _make_wav(samples, rate=16000, extra_chunk=True)
    )
    assert (n_ch, rate, bits, n_frames) == (1, 16000, 16, 6)
    import struct

    assert list(struct.unpack("<6h", pcm)) == samples
    # 8-bit unsigned path
    n_ch, rate, bits, n_frames, pcm = decode_wav_one(
        _make_wav([128, 255, 0, 128], bits=8)
    )
    assert (bits, n_frames, list(pcm)) == (8, 4, [128, 255, 0, 128])


def test_decode_audio_mapinpandas(spark):
    import math

    from etl_migrate_api_spark.operators.multimodal import decode_audio

    full = _make_wav([32767, -32768] * 100, rate=8000)  # full-scale square
    silent = _make_wav([0] * 400, rate=8000)
    junk = b"not audio at all"
    df = spark.createDataFrame(
        [(1, full), (2, silent), (3, junk)],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert out[1]["ok"] and out[1]["n_frames"] == 200
    assert out[1]["duration_s"] == 200 / 8000
    # full-scale square wave: rms ~1.0 (32767/32768 and 32768/32768)
    assert abs(out[1]["rms"] - 1.0) < 1e-4
    assert out[2]["ok"] and out[2]["rms"] == 0.0  # silence gate signal
    assert not out[3]["ok"] and "RIFF" in out[3]["err"]


def test_planted_wav_rows_really_decode(media):
    """Every audio row in the fake media table must decode as a valid
    16-bit mono 8 kHz WAV with 32 frames of real PCM (not ok=false
    plumbing): the registered llm_multimodal_audio query rides this."""
    from etl_migrate_api_spark.operators.multimodal import decode_audio

    rows = decode_audio(
        media.where(F.col("media_type") == "audio")
    ).collect()
    assert rows and all(r["ok"] for r in rows)
    for r in rows:
        assert (r["n_channels"], r["sample_rate"], r["bits"]) == (1, 8000, 16)
        assert r["n_frames"] == 32 and r["duration_s"] == 32 / 8000
        assert 0.0 < r["rms"] <= 1.0  # md5 noise: nonzero, in range
