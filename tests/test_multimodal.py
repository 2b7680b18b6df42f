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
    # signature+IHDR ++ payload; audio = 44-byte WAV header ++ payload;
    # video = 28-byte Y4M header ++ 4 × (6-byte FRAME marker + 16 bytes)
    assert media.where(
        (F.col("media_type") == "video") & (F.length("content") != 116)
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
    assert len(rows) == n_videos * 7  # floor(116 bytes / 16)
    assert all(len(r["frame"]) == 16 for r in rows)
    assert {r["frame_idx"] for r in rows} == set(range(7))
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
    from etl_migrate_api_spark.operators.jpeg import decode_jpeg, encode_jpeg

    jpeg_src = bytes((x * 7 + 3) % 256 for x in range(16 * 16 * 3))
    jpeg = encode_jpeg(jpeg_src, 16, 16, "RGB", quality=95)
    jpeg_px = decode_jpeg(jpeg)[3]
    bad_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16  # truncated garbage
    junk = b"\x00\x01\x02\x03not an image"
    df = spark.createDataFrame(
        [(1, "image", png), (2, "image", bmp), (3, "image", ppm),
         (4, "image", jpeg), (5, "image", junk), (6, "image", bad_jpeg)],
        "media_id long, media_type string, content binary",
    )
    from etl_migrate_api_spark.operators.multimodal import decode_pixels

    out = {r["media_id"]: r for r in decode_pixels(df).collect()}
    assert out[1]["ok"] and out[1]["px_crc32"] == zlib.crc32(pixels)
    assert (out[1]["width"], out[1]["height"], out[1]["mode"]) == (w, h, "RGB")
    assert out[2]["ok"] and out[2]["px_crc32"] == zlib.crc32(bgr)
    assert out[3]["ok"] and out[3]["px_crc32"] == zlib.crc32(ppm_px)
    assert out[3]["mean_px"] == sum(ppm_px) / len(ppm_px)
    # real baseline JPEG decodes through the pure-stdlib path (no PIL)
    assert out[4]["ok"] and out[4]["px_crc32"] == zlib.crc32(jpeg_px)
    assert (out[4]["width"], out[4]["height"], out[4]["mode"]) == (16, 16, "RGB")
    assert not out[5]["ok"] and "unknown image container" in out[5]["err"]
    assert not out[6]["ok"] and "truncated" in out[6]["err"]


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


# --- real video decode (Y4M) -----------------------------------------------


def _make_y4m(width, height, y_planes, colorspace="mono", fps=(30, 1)):
    """Minimal YUV4MPEG2 writer; for non-mono colorspaces the chroma
    planes are zero-filled to the correct length."""
    from etl_migrate_api_spark.operators.video import _frame_bytes

    hdr = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} C{colorspace}\n".encode()
    fsize = _frame_bytes(width, height, colorspace)
    body = b""
    for y in y_planes:
        assert len(y) == width * height
        body += b"FRAME\n" + y + b"\x00" * (fsize - len(y))
    return hdr + body


def test_y4m_decode_exact():
    from etl_migrate_api_spark.operators.video import decode_y4m_one

    planes = [bytes((x * 31 + i) % 256 for x in range(12)) for i in range(3)]
    w, h, num, den, cs, got = decode_y4m_one(_make_y4m(4, 3, planes, fps=(25, 1)))
    assert (w, h, num, den, cs) == (4, 3, 25, 1, "mono")
    assert got == planes
    # 4:2:0 chroma subsampling: frame = w*h*3/2, luma still first w*h
    w, h, num, den, cs, got = decode_y4m_one(
        _make_y4m(4, 2, [bytes(range(8))], colorspace="420jpeg")
    )
    assert (w, h, cs) == (4, 2, "420jpeg") and got == [bytes(range(8))]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m_one(b"RIFF....WAVE")
    with _pytest.raises(ValueError, match="truncated frame"):
        decode_y4m_one(_make_y4m(4, 3, [planes[0]])[:-5])


def test_decode_video_mapinpandas(spark):
    import zlib

    from etl_migrate_api_spark.operators.video import decode_video

    planes = [bytes((x * 7 + i * 3) % 256 for x in range(16)) for i in range(5)]
    good = _make_y4m(4, 4, planes, fps=(24, 1))
    junk = b"definitely not video"
    df = spark.createDataFrame(
        [(1, good), (2, junk)], "media_id long, content binary"
    )
    rows = decode_video(df).collect()
    good_rows = sorted(
        (r for r in rows if r["media_id"] == 1), key=lambda r: r["frame_idx"]
    )
    assert len(good_rows) == 5
    for i, r in enumerate(good_rows):
        assert r["ok"] and (r["width"], r["height"], r["fps"]) == (4, 4, 24.0)
        assert r["y_crc32"] == zlib.crc32(planes[i])
        assert r["y_mean"] == sum(planes[i]) / 16
    # frame_stride samples every other frame
    strided = decode_video(df.where("media_id = 1"), frame_stride=2).collect()
    assert sorted(r["frame_idx"] for r in strided) == [0, 2, 4]
    bad = [r for r in rows if r["media_id"] == 2]
    assert len(bad) == 1 and not bad[0]["ok"] and "video container" in bad[0]["err"]


def test_planted_y4m_rows_really_decode(media):
    """Every video row in the fake media table must decode as a valid
    4x4 mono 25fps Y4M with 4 frames whose luma planes are exactly the
    16-byte payload slices — the registered llm_multimodal_video query
    rides this."""
    import zlib

    from etl_migrate_api_spark.operators.video import decode_video, decode_y4m_one

    vids = media.where(F.col("media_type") == "video")
    rows = decode_video(vids).collect()
    n_videos = vids.count()
    assert len(rows) == n_videos * 4 and all(r["ok"] for r in rows)
    for r in rows:
        assert (r["width"], r["height"], r["fps"]) == (4, 4, 25.0)
    # cross-check one blob end-to-end against the pure-python decoder
    blob = vids.limit(1).collect()[0]
    _, _, _, _, _, planes = decode_y4m_one(bytes(blob["content"]))
    spark_rows = sorted(
        (r for r in rows if r["media_id"] == blob["media_id"]),
        key=lambda r: r["frame_idx"],
    )
    assert [r["y_crc32"] for r in spark_rows] == [zlib.crc32(p) for p in planes]


# --- resize ----------------------------------------------------------------


def test_resize_nearest_exact():
    import numpy as np

    from etl_migrate_api_spark.operators.multimodal import resize_nearest_one

    # 2x2 RGB doubled → each source pixel becomes a 2x2 block (kron)
    src = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    up = resize_nearest_one(src.tobytes(), 2, 2, 3, 4, 4)
    expect = np.kron(src.transpose(2, 0, 1), np.ones((2, 2), np.uint8)).transpose(1, 2, 0)
    assert up == np.ascontiguousarray(expect).tobytes()
    # downscale 4x4 → 2x2 picks pixels at src index (dst*4)//2 = 0, 2
    src = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    down = resize_nearest_one(src.tobytes(), 4, 4, 1, 2, 2)
    assert list(down) == [0, 2, 8, 10]
    # non-integer ratio 3 → 2: indices (0*3)//2=0, (1*3)//2=1
    src = np.arange(9, dtype=np.uint8).reshape(3, 3, 1)
    assert list(resize_nearest_one(src.tobytes(), 3, 3, 1, 2, 2)) == [0, 1, 3, 4]


def test_resize_images_mapinpandas(spark):
    """Resize through the Spark plan equals pure-python decode+resize,
    bad rows degrade per-row."""
    import zlib

    from etl_migrate_api_spark.operators.multimodal import (
        decode_pixels_one,
        resize_images,
        resize_nearest_one,
    )

    w, h = 6, 4
    pixels = bytes((x * 17 + 3) % 256 for x in range(w * h * 3))
    png = _make_png(w, h, pixels, color_type=2, filters=[0, 1, 2, 3])
    df = spark.createDataFrame(
        [(1, png), (2, b"garbage")], "media_id long, content binary"
    )
    out = {r["media_id"]: r for r in resize_images(df, 3, 2).collect()}
    dw, dh, mode, px = decode_pixels_one(png)
    expect = resize_nearest_one(px, dw, dh, 3, 3, 2)
    assert out[1]["ok"] and out[1]["px_crc32"] == zlib.crc32(expect)
    assert (out[1]["src_w"], out[1]["src_h"]) == (w, h)
    assert (out[1]["out_w"], out[1]["out_h"]) == (3, 2)
    assert out[1]["mean_px"] == sum(expect) / len(expect)
    assert not out[2]["ok"]


def test_png_encode_roundtrip():
    from etl_migrate_api_spark.operators.multimodal import (
        decode_pixels_one,
        encode_png_one,
    )

    px = bytes((x * 23 + 9) % 256 for x in range(4 * 4 * 3))
    blob = encode_png_one(px, 4, 4, "RGB")
    assert decode_pixels_one(blob) == (4, 4, "RGB", px)
    gray = bytes(range(12))
    assert decode_pixels_one(encode_png_one(gray, 4, 3, "L")) == (4, 3, "L", gray)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pixel buffer"):
        encode_png_one(px[:-1], 4, 4, "RGB")


def test_encode_resize_pipeline_spark(spark):
    """encode_images → resize_images through Spark equals the pure-python
    path for every row (the llm_image_resize query shape)."""
    import zlib

    from etl_migrate_api_spark.operators.multimodal import (
        encode_images,
        resize_images,
        resize_nearest_one,
    )

    data = [
        (i, bytes((x * (i + 3) + i) % 256 for x in range(4 * 4 * 3)))
        for i in range(5)
    ]
    df = spark.createDataFrame(data, "media_id long, pixels binary")
    out = {r["media_id"]: r for r in resize_images(encode_images(df, 4, 4, "RGB"), 8, 8).collect()}
    assert len(out) == 5
    for i, px in data:
        expect = resize_nearest_one(px, 4, 4, 3, 8, 8)
        assert out[i]["ok"] and out[i]["px_crc32"] == zlib.crc32(expect)
        assert (out[i]["src_w"], out[i]["src_h"]) == (4, 4)
