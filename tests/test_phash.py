"""Perceptual-hash image dedup gates: determinism, exact-copy hamming 0,
tiny-perturbation robustness, distinct-image separation, and the
registered query's planted-pair recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.operators.dedup import hamming64_pairs
from etl_migrate_api_spark.operators.multimodal import phash64_one, phash_images


def _img(seed: int, w: int = 8, h: int = 8) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()


def test_phash_deterministic():
    px = _img(1)
    assert phash64_one(px, 8, 8) == phash64_one(px, 8, 8)


def test_phash_tiny_perturbation_within_3_bits():
    px = np.frombuffer(_img(2), dtype=np.uint8).copy()
    px[0] ^= 1  # flip the lowest bit of one channel of one pixel
    a = phash64_one(_img(2), 8, 8)
    b = phash64_one(px.tobytes(), 8, 8)
    ham = bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")
    assert ham <= 3, ham


def test_phash_distinct_images_far_apart():
    hams = []
    for s in range(3, 23):
        a = phash64_one(_img(s), 8, 8)
        b = phash64_one(_img(s + 100), 8, 8)
        hams.append(bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1"))
    # 64 median-threshold bits: distinct images hover near 32; none
    # should sneak under the dedup threshold
    assert min(hams) > 3
    assert sum(hams) / len(hams) > 20


def test_phash_grayscale_and_rgb_paths():
    g = np.arange(64, dtype=np.uint8).tobytes()  # 8x8 L
    lo, hi = phash64_one(g, 8, 8)
    assert (lo, hi) == phash64_one(g, 8, 8)
    with pytest.raises(ValueError):
        phash64_one(g[:10], 8, 8)


def test_phash_pairs_find_planted_copies(spark):
    rows = [(i, bytearray(_img(i, 4, 4))) for i in range(20)]
    rows += [(i + 1000, bytearray(_img(i, 4, 4))) for i in range(0, 20, 4)]
    df = spark.createDataFrame(
        [(i, bytes(b)) for i, b in rows], "media_id long, pixels binary"
    )
    sigs = phash_images(df, 4, 4)
    pairs = hamming64_pairs(sigs, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(i, i + 1000) for i in range(0, 20, 4)}
    assert want <= got
    for r in pairs:
        if (r["id_a"], r["id_b"]) in want:
            assert r["hamming"] == 0


# ---- property: pigeonhole banding is lossless for hamming <= 3 ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sigs=st.lists(
        st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 2**32 - 1)),
        min_size=2,
        max_size=8,
        unique=True,
    ),
    flips=st.lists(st.integers(0, 63), min_size=0, max_size=3),
)
def test_hamming64_pairs_lossless(spark, sigs, flips):
    """hamming64_pairs must return EXACTLY the all-pairs ≤-3 set: the
    4×16 pigeonhole guarantees no pair is lost; the verify step
    guarantees none is extra. A ≤3-bit-flipped twin of sig[0] is
    appended so close pairs always exist."""
    rows = [(i, lo, hi) for i, (lo, hi) in enumerate(sigs)]
    lo0, hi0 = sigs[0]
    for b in set(flips):
        if b < 32:
            lo0 ^= 1 << b
        else:
            hi0 ^= 1 << (b - 32)
    rows.append((len(rows), lo0, hi0))
    df = spark.createDataFrame(rows, "id long, lo long, hi long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming64_pairs(df, max_hamming=3).collect()
    }
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            h = bin(
                (rows[i][1] ^ rows[j][1]) | ((rows[i][2] ^ rows[j][2]) << 32)
            ).count("1")
            if h <= 3:
                want[(rows[i][0], rows[j][0])] = h
    assert got == want
