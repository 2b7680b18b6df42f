"""Audio energy-contour fingerprint gates: determinism, gain invariance
(the property byte hashing lacks), noise robustness, distinct-signal
separation, and planted-pair recall through the shared band join."""

from __future__ import annotations

import struct

import numpy as np

from etl_migrate_api_spark.operators.dedup import hamming64_pairs
from etl_migrate_api_spark.operators.multimodal import (
    audio_hash64_one,
    audio_hash_table,
)


def _wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    pcm = np.clip(samples, -32768, 32767).astype("<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def _sig(seed: int, n: int = 2048) -> np.ndarray:
    """Tone+noise test signal; the tone FREQUENCY varies with the seed
    (a same-frequency pair has a near-identical energy contour by
    construction — the contour hash keys on periodicity, so 'distinct'
    fixtures must actually differ in contour, not just in noise)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    tone = 8000 * np.sin(2 * np.pi * t * (3 + 2 * seed) / n)
    return tone + rng.normal(0, 500, n)


def _ham(a, b) -> int:
    return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")


def test_audio_hash_deterministic():
    w = _wav(_sig(1))
    assert audio_hash64_one(w) == audio_hash64_one(w)


def test_audio_hash_gain_invariant():
    x = _sig(2)
    a = audio_hash64_one(_wav(x))
    b = audio_hash64_one(_wav(x * 0.5))  # re-mastered at half gain
    assert _ham(a, b) == 0  # energies scale uniformly; contour unchanged


def test_audio_hash_small_noise_within_3_bits():
    x = _sig(3)
    rng = np.random.default_rng(99)
    a = audio_hash64_one(_wav(x))
    b = audio_hash64_one(_wav(x + rng.normal(0, 20, len(x))))
    assert _ham(a, b) <= 3


def test_audio_hash_distinct_signals_far_apart():
    hams = [
        _ham(audio_hash64_one(_wav(_sig(s))), audio_hash64_one(_wav(_sig(s + 50))))
        for s in range(4, 16)
    ]
    assert min(hams) > 3 and sum(hams) / len(hams) > 15


def test_audio_pairs_find_planted_copies(spark):
    rows = [(i, _wav(_sig(i))) for i in range(12)]
    rows += [(i + 1000, _wav(_sig(i) * 2.0)) for i in range(0, 12, 3)]  # gain x2
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = hamming64_pairs(audio_hash_table(df), max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(i, i + 1000) for i in range(0, 12, 3)}
    assert want <= got


def test_audio_hash_table_drops_undecodable(spark):
    df = spark.createDataFrame(
        [(1, _wav(_sig(7))), (2, b"not a wav at all")],
        "media_id long, content binary",
    )
    ids = {r["id"] for r in audio_hash_table(df).collect()}
    assert ids == {1}


def test_audio_hash_table_drops_unsupported_depth_without_crash(spark):
    """ADVICE r6: a 24-bit WAV must be DROPPED from the index (decoder
    raises ValueError — caught), while a non-decode bug (e.g. a null
    content column → TypeError) must PROPAGATE, not silently shrink
    coverage."""
    import pytest

    from etl_migrate_api_spark.operators.multimodal import audio_hash_table

    fmt24 = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    pcm24 = b"\x00\x01\x02" * 30
    wav24 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt24) + 8 + len(pcm24)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt24)) + fmt24
        + b"data" + struct.pack("<I", len(pcm24)) + pcm24
    )
    good = _wav(_sig(7))
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(wav24))],
        "media_id long, content binary",
    )
    got = audio_hash_table(df).collect()
    assert [r["id"] for r in got] == [1]  # 24-bit row dropped, good row kept

    broken = spark.createDataFrame(
        [(3, None)], "media_id long, content binary"
    )
    with pytest.raises(Exception):  # TypeError from bytes(None) must surface
        audio_hash_table(broken).collect()
