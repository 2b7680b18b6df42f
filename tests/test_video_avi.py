"""MJPEG-in-AVI gates: bit-reproducible mux (pinned CRCs), container
walk + per-frame JPEG entropy decode, luma fidelity vs the source
frames, mixed-container dispatch through decode_video, corrupt-input
rejection, and planted-copy recall through the shared band join."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_migrate_api_spark.operators.dedup import hamming64_pairs
from etl_migrate_api_spark.operators.video import (
    decode_avi_mjpeg_one,
    decode_video,
    decode_video_one,
    encode_avi_mjpeg,
    fake_avi_table,
)


def _frames(seed: int, w: int = 16, h: int = 16, n: int = 3) -> list[bytes]:
    rng = np.random.RandomState(seed)
    return [(rng.rand(h, w, 3) * 255).astype(np.uint8).tobytes() for _ in range(n)]


def test_avi_roundtrip_pinned_crcs():
    # Pinned against the first implementation: the muxer is a pure
    # function, so any byte-level drift (header layout, JPEG tables,
    # padding) shows up here before it silently re-hashes a corpus.
    blob = encode_avi_mjpeg(_frames(7), 16, 16, "RGB", fps=30, quality=90,
                            subsampling="420")
    assert zlib.crc32(blob) == 3391324937
    w, h, num, den, planes = decode_avi_mjpeg_one(blob)
    assert (w, h, num, den) == (16, 16, 30, 1)
    assert [zlib.crc32(p) for p in planes] == [
        378675438, 1950459708, 1271628791,
    ]


def test_avi_luma_fidelity():
    frames = _frames(11)
    blob = encode_avi_mjpeg(frames, 16, 16, "RGB", quality=90)
    _, _, _, _, planes = decode_avi_mjpeg_one(blob)
    for src_px, plane in zip(frames, planes):
        src = np.frombuffer(src_px, dtype=np.uint8).reshape(16, 16, 3)
        src = src.astype(np.float64)
        y = 0.299 * src[:, :, 0] + 0.587 * src[:, :, 1] + 0.114 * src[:, :, 2]
        got = np.frombuffer(plane, dtype=np.uint8).reshape(16, 16)
        # q90 JPEG on white-noise frames: luma should survive within a
        # few gray levels on average (worst case for DCT compression)
        assert float(np.abs(y - got.astype(np.float64)).mean()) < 8.0


def test_avi_gray_mode_roundtrip():
    rng = np.random.RandomState(3)
    frames = [(rng.rand(8, 8) * 255).astype(np.uint8).tobytes() for _ in range(2)]
    blob = encode_avi_mjpeg(frames, 8, 8, "L", fps=25)
    w, h, num, den, codec, planes = decode_video_one(blob)
    assert (w, h, num, den, codec, len(planes)) == (8, 8, 25, 1, "mjpeg", 2)


def test_avi_corrupt_inputs():
    good = encode_avi_mjpeg(_frames(1), 16, 16)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_mjpeg_one(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi_mjpeg_one(good[: len(good) // 2])  # truncated mid-tree
    # flip the stream handler to a codec we cannot decode
    h264 = good.replace(b"vidsMJPG", b"vidsH264").replace(b"MJPG", b"H264")
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        decode_avi_mjpeg_one(h264)
    # clobber the first frame's SOI marker → frame-indexed error
    pos = good.find(b"00dc") + 8
    bad = good[:pos] + b"\x00\x00" + good[pos + 2 :]
    with pytest.raises(ValueError, match="frame 0"):
        decode_avi_mjpeg_one(bad)


def test_decode_video_mixed_containers(spark):
    rng = np.random.RandomState(5)
    y4m = (
        b"YUV4MPEG2 W4 H4 F25:1 Cmono\n"
        + b"".join(
            b"FRAME\n" + rng.randint(0, 256, 16).astype(np.uint8).tobytes()
            for _ in range(2)
        )
    )
    avi = encode_avi_mjpeg(_frames(5, 8, 8, 2), 8, 8, fps=10)
    df = spark.createDataFrame(
        [(1, y4m), (2, avi), (3, b"\x00garbage")],
        "media_id long, content binary",
    )
    rows = {(r["media_id"], r["frame_idx"]): r for r in decode_video(df).collect()}
    assert rows[(1, 0)]["ok"] and rows[(1, 1)]["width"] == 4
    assert rows[(2, 0)]["ok"] and rows[(2, 1)]["fps"] == 10.0
    assert not rows[(3, -1)]["ok"]
    assert "unknown video container" in rows[(3, -1)]["err"]


def test_avi_keyframe_dedup_planted_copies(spark):
    ids = spark.createDataFrame([(i,) for i in range(8)], "media_id long")
    blobs = fake_avi_table(ids)
    planted = blobs.unionByName(
        blobs.where("media_id % 2 = 0").selectExpr(
            "media_id + 1000 as media_id", "content"
        )
    )
    from etl_migrate_api_spark.operators.video import video_phash_table

    pairs = hamming64_pairs(video_phash_table(planted), max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for i in range(0, 8, 2):
        assert got.get((i, i + 1000)) == 0


def test_avi_idx1_offsets_point_at_frames():
    # the index is real metadata a player seeks with: every idx1 entry's
    # offset (relative to the 'movi' fourcc) must land on its 00dc header
    blob = encode_avi_mjpeg(_frames(9, 8, 8, 4), 8, 8)
    movi_at = blob.find(b"movi")
    idx_at = blob.find(b"idx1")
    (idx_size,) = struct.unpack("<I", blob[idx_at + 4 : idx_at + 8])
    assert idx_size == 16 * 4
    for i in range(4):
        ckid, flags, off, size = struct.unpack(
            "<4sIII", blob[idx_at + 8 + 16 * i : idx_at + 24 + 16 * i]
        )
        assert ckid == b"00dc" and flags == 0x10
        assert blob[movi_at + off : movi_at + off + 4] == b"00dc"
        (cksize,) = struct.unpack(
            "<I", blob[movi_at + off + 4 : movi_at + off + 8]
        )
        assert cksize == size
        # chunk payload is a complete JPEG: SOI..EOI
        jpg = blob[movi_at + off + 8 : movi_at + off + 8 + size]
        assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
