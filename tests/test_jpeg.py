"""Baseline JPEG codec gates (operators/jpeg.py) — the same
CRC-exactness discipline as the PNG inflate path: pinned pixel CRCs,
round-trip error bounds, restart/subsampling/grayscale coverage, and
corrupt-input behavior. No PIL anywhere (the container has none — that
is the point)."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from etl_migrate_api_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), np.uint8)
    for c in range(3):
        img[:, :, c] = (np.add.outer(np.arange(h) * 3, np.arange(w) * 2) + c * 17) % 256
    return img


def test_solid_color_exact():
    px = bytes([120, 200, 40]) * (16 * 16)
    w, h, mode, out = decode_jpeg(encode_jpeg(px, 16, 16, "RGB", quality=95))
    assert (w, h, mode) == (16, 16, "RGB")
    a = np.frombuffer(out, np.uint8).reshape(16, 16, 3).astype(int)
    assert np.abs(a - np.array([120, 200, 40])).max() == 0


def test_gray_gradient_exact_at_q95():
    g = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
    w, h, mode, out = decode_jpeg(encode_jpeg(g.tobytes(), 64, 64, "L", quality=95))
    assert (w, h, mode) == (64, 64, "L")
    a = np.frombuffer(out, np.uint8).reshape(64, 64).astype(int)
    assert np.abs(a - g.astype(int)).max() == 0


def test_rgb_roundtrip_error_bound():
    img = _gradient_rgb(33, 41)  # non-multiple-of-8/16 dims → padding path
    for sub in ("444", "420"):
        b = encode_jpeg(img.tobytes(), 41, 33, "RGB", quality=90, subsampling=sub)
        w, h, mode, out = decode_jpeg(b)
        assert (w, h, mode) == (41, 33, "RGB")
        a = np.frombuffer(out, np.uint8).reshape(33, 41, 3).astype(int)
        # smooth gradient: 4:4:4 is near-exact; 4:2:0 adds chroma loss
        assert np.abs(a - img.astype(int)).mean() < (0.5 if sub == "444" else 2.0)


def test_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(3)
    img = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
    plain = encode_jpeg(img.tobytes(), 56, 40, "RGB", quality=90)
    rst = encode_jpeg(img.tobytes(), 56, 40, "RGB", quality=90, restart_interval=3)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI emitted
    assert decode_jpeg(plain)[3] == decode_jpeg(rst)[3]


def test_deterministic_and_pinned_crc():
    """The codec is a pure function: a fixed input must produce the
    same JPEG bytes and the same decoded pixels forever. If this pin
    moves, the decode semantics changed — that is a release decision,
    not noise."""
    rng = np.random.RandomState(42)
    img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
    b1 = encode_jpeg(img.tobytes(), 24, 24, "RGB", quality=90)
    b2 = encode_jpeg(img.tobytes(), 24, 24, "RGB", quality=90)
    assert b1 == b2
    w, h, mode, px = decode_jpeg(b1)
    assert (w, h, mode) == (24, 24, "RGB")
    assert zlib.crc32(b1) == 2113461396
    assert zlib.crc32(px) == 2102717104


def test_exact_copy_blobs_decode_identically():
    rng = np.random.RandomState(7)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    b = encode_jpeg(img.tobytes(), 16, 16, "RGB", quality=90, subsampling="420")
    assert decode_jpeg(b)[3] == decode_jpeg(bytes(b))[3]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:50],  # truncated header
        lambda b: b[:-30],  # truncated entropy stream
        lambda b: b"\xff\xd8\xff\xe0garbage",
        lambda b: b.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF
        lambda b: b.replace(b"\xff\xc4", b"\xff\xd9", 1),  # missing DHT
        lambda b: b"",
    ],
)
def test_corrupt_inputs_raise_valueerror(mutate):
    good = encode_jpeg(bytes(range(48)) * 16, 16, 16, "RGB", quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(mutate(good))


def test_decode_pixels_one_dispatches_to_stdlib_jpeg():
    """decode_pixels_one must decode JPEG magic without PIL (this
    container has none) via the baseline decoder, not raise."""
    from etl_migrate_api_spark.operators.multimodal import decode_pixels_one

    img = _gradient_rgb(16, 16)
    b = encode_jpeg(img.tobytes(), 16, 16, "RGB", quality=95)
    w, h, mode, px = decode_jpeg(b)
    assert decode_pixels_one(b) == (w, h, mode, px)


def test_jpeg_phash_dedup_query(spark, sf_small):
    """The registered rows-only query: planted exact JPEG byte copies
    land at hamming 0; output pairs are (orig, orig+600000)."""
    from etl_migrate_api_spark.plans.llm_ops import llm_jpeg_phash_dedup

    out = llm_jpeg_phash_dedup(spark, sf_small).collect()
    assert out, "planted copies must produce pairs"
    exact = [r for r in out if r["id_b"] - r["id_a"] == 600000]
    assert exact, out[:5]
    for r in exact:
        assert r["hamming"] == 0, r
