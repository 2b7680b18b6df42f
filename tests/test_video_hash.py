"""Video keyframe-hash dedup gates: determinism, planted-copy recall
through the band join, undecodable-row dropping, and keyframe
sensitivity (different first frames → far-apart hashes)."""

from __future__ import annotations

import numpy as np

from etl_migrate_api_spark.operators.dedup import hamming64_pairs
from etl_migrate_api_spark.operators.video import video_phash_table


def _y4m(seed: int, w: int = 8, h: int = 8, frames: int = 3) -> bytes:
    rng = np.random.default_rng(seed)
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Cmono\n".encode()
    out = [head]
    for _ in range(frames):
        out.append(b"FRAME\n")
        out.append(rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes())
    return b"".join(out)


def test_video_phash_pairs_and_determinism(spark):
    rows = [(i, _y4m(i)) for i in range(10)]
    rows += [(i + 1000, _y4m(i)) for i in range(0, 10, 2)]  # exact copies
    rows += [(99, b"not a y4m")]  # dropped
    df = spark.createDataFrame(rows, "media_id long, content binary")
    sigs1 = {tuple(r) for r in video_phash_table(df).collect()}
    sigs2 = {tuple(r) for r in video_phash_table(df).collect()}
    assert sigs1 == sigs2
    assert 99 not in {s[0] for s in sigs1}
    pairs = hamming64_pairs(video_phash_table(df), max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for i in range(0, 10, 2):
        assert got.get((i, i + 1000)) == 0


def test_video_phash_distinct_keyframes_far_apart(spark):
    a = video_phash_table(
        spark.createDataFrame(
            [(1, _y4m(1)), (2, _y4m(50))], "media_id long, content binary"
        )
    ).collect()
    s = {r["id"]: (r["lo"], r["hi"]) for r in a}
    ham = bin(
        (s[1][0] ^ s[2][0]) | ((s[1][1] ^ s[2][1]) << 32)
    ).count("1")
    assert ham > 3
