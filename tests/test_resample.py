"""Audio rate-normalization gates: identity at same rate, byte-exact
up-then-down round trip, duration scaling, sine frequency preservation,
the cross-rate dedup story (raw fingerprints DIVERGE across rates;
normalized ones collide at hamming 0), per-row error rows, and the
Spark-side resample_audio + hash pipeline over planted cross-rate
copies."""

from __future__ import annotations

import numpy as np
import pytest

from etl_migrate_api_spark.operators.multimodal import (
    audio_hash64_one,
    decode_wav_one,
    encode_wav,
    resample_audio,
    resample_pcm_one,
)


def _ham(a: tuple[int, int], b: tuple[int, int]) -> int:
    return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")


def _noise_wav(seed: int, n: int = 800, rate: int = 8000) -> bytes:
    rng = np.random.RandomState(seed)
    return encode_wav(
        rng.randint(-20000, 20000, n).astype("<i2").tobytes(), rate
    )


def test_identity_and_updown_roundtrip_exact():
    w = _noise_wav(1)
    same = resample_pcm_one(w, 8000)
    assert decode_wav_one(same)[4] == decode_wav_one(w)[4]
    # 2x up then 2x down: integer source positions copy samples, so the
    # surviving (even) samples are untouched — byte-exact round trip
    up = resample_pcm_one(w, 16000)
    back = resample_pcm_one(up, 8000)
    assert decode_wav_one(back)[4] == decode_wav_one(w)[4]
    # duration scaling
    assert decode_wav_one(up)[3] == 2 * decode_wav_one(w)[3]
    third = resample_pcm_one(w, 12000)
    assert decode_wav_one(third)[3] == round(800 * 12000 / 8000)


def test_sine_frequency_preserved():
    t = np.arange(16000) / 16000.0
    w = encode_wav(
        (10000 * np.sin(2 * np.pi * 440 * t)).astype("<i2").tobytes(), 16000
    )
    x = np.frombuffer(
        decode_wav_one(resample_pcm_one(w, 8000))[4], dtype="<i2"
    ).astype(np.float64)
    x = x[x != 0]  # exact zeros would split one crossing into two products
    zc_per_s = ((x[:-1] * x[1:]) < 0).sum() / (8000 / 8000.0)
    assert abs(zc_per_s - 880) <= 10, zc_per_s  # 440 Hz → 880 crossings/s


def test_cross_rate_fingerprints_need_normalization():
    w8 = _noise_wav(7)
    w16 = resample_pcm_one(w8, 16000)  # the "same recording at 16 kHz"
    raw = _ham(audio_hash64_one(w8), audio_hash64_one(w16))
    norm = _ham(
        audio_hash64_one(w8), audio_hash64_one(resample_pcm_one(w16, 8000))
    )
    assert raw > 3, raw  # un-normalized copies do NOT meet the dedup bar
    assert norm == 0  # normalized copies are exact


def test_bit_depth_conversion_and_errors():
    # 8-bit input: full-scale mapping into 16-bit range
    pcm8 = bytes([128, 255, 0, 128])
    w = b"".join(
        [
            b"RIFF", (36 + 4).to_bytes(4, "little"), b"WAVEfmt ",
            (16).to_bytes(4, "little"), (1).to_bytes(2, "little"),
            (1).to_bytes(2, "little"), (8000).to_bytes(4, "little"),
            (8000).to_bytes(4, "little"), (1).to_bytes(2, "little"),
            (8).to_bytes(2, "little"), b"data", (4).to_bytes(4, "little"),
            pcm8,
        ]
    )
    out = np.frombuffer(decode_wav_one(resample_pcm_one(w, 8000))[4], "<i2")
    assert list(out) == [0, 32512, -32768, 0]
    with pytest.raises(ValueError):
        resample_pcm_one(_noise_wav(2), 0)
    with pytest.raises(ValueError):
        resample_pcm_one(b"not a wav", 8000)


def test_spark_resample_pipeline_cross_rate_dedup(spark):
    from etl_migrate_api_spark.operators.dedup import hamming64_pairs
    from etl_migrate_api_spark.operators.multimodal import audio_hash_table

    base = [(i, _noise_wav(i)) for i in range(6)]
    published_16k = [
        (i + 1000, resample_pcm_one(w, 16000)) for i, w in base[::2]
    ]
    df = spark.createDataFrame(
        base + published_16k, "media_id long, content binary"
    )
    normalized = resample_audio(df, target_rate=8000)
    rows = {r["media_id"]: r for r in normalized.collect()}
    assert all(r["ok"] and r["sample_rate"] == 8000 for r in rows.values())
    sigs = audio_hash_table(
        normalized.where("ok").select("media_id", "content")
    )
    pairs = hamming64_pairs(sigs, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for i in range(0, 6, 2):
        assert got.get((i, i + 1000)) == 0
    # error rows are data, not exceptions
    bad = spark.createDataFrame(
        [(99, b"nope")], "media_id long, content binary"
    )
    r = resample_audio(bad).collect()[0]
    assert not r["ok"] and r["err"]


def test_resample_properties_hypothesis():
    """Property gates over random PCM and rates: output frame count is
    exactly round(n·target/src), same-rate resample is the identity,
    integer-ratio upsample keeps every source sample at stride k, and
    output samples never leave the convex hull of the input (linear
    interpolation cannot overshoot)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        src=st.sampled_from([8000, 11025, 16000, 22050, 44100]),
        k=st.integers(min_value=2, max_value=4),
    )
    def check(n, seed, src, k):
        rng = np.random.RandomState(seed)
        x = rng.randint(-32768, 32767, n).astype("<i2")
        w = encode_wav(x.tobytes(), src)
        up = resample_pcm_one(w, src * k)
        _, rate, _, n_out, pcm = decode_wav_one(up)
        y = np.frombuffer(pcm, "<i2")
        assert rate == src * k and n_out == round(n * k)
        # stride-k samples are the source, untouched
        assert np.array_equal(y[::k], x)
        # no overshoot: linear interp stays inside [min, max]
        assert y.min() >= x.min() and y.max() <= x.max()
        # identity at the same rate
        assert decode_wav_one(resample_pcm_one(w, src))[4] == x.tobytes()
        # arbitrary-ratio frame-count contract
        third = resample_pcm_one(w, 12000)
        assert decode_wav_one(third)[3] == max(1, round(n * 12000 / src))

    check()
