"""Model-inference embedding hook (operators/encoder.py): backend
resolution, the mapInPandas decode→preprocess→batched-GEMM path,
fallback behavior, error rows, and ANN composition over the produced
embeddings. The onnx/torch loaders are env-gated (not installed here);
their shared runner plumbing is exercised through the callable
backend, which takes the identical executor-side code path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_migrate_api_spark.operators.encoder import (
    ONNX_ENV,
    model_embed,
    preprocess_one,
    projection_encoder,
    resolve_encoder,
)
from etl_migrate_api_spark.operators.multimodal import (
    encode_images,
    encode_png_one,
    fake_media_table,
)


def _png_df(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    media = fake_media_table(docs).where(F.col("media_type") == "image")
    pixels = media.select(
        "media_id", F.substring("content", 34, 48).alias("pixels")
    )
    return encode_images(pixels, 4, 4, "RGB")


def test_resolve_encoder_precedence(monkeypatch):
    fn = lambda x: x  # noqa: E731
    assert resolve_encoder(fn) == (fn, "callable")
    monkeypatch.delenv(ONNX_ENV, raising=False)
    spec, label = resolve_encoder(None)
    assert spec is None and label == "byte_histogram"
    # env set but runtime missing → clean fallback, no crash
    monkeypatch.setenv(ONNX_ENV, "/nonexistent/model.onnx")
    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime unexpectedly present")
    except ImportError:
        pass
    spec, label = resolve_encoder(None)
    assert spec is None and label == "byte_histogram"


def test_projection_encoder_matches_local_inference(spark, sf_small):
    """The distributed mapInPandas path must reproduce the local
    decode→preprocess→GEMM on every row to float32 GEMM tolerance
    (BLAS blocks batched and single-row matmuls differently, so the
    last bits differ) — proves the Arrow batching and worker-side
    model cache change nothing else."""
    pngs = _png_df(spark, sf_small).limit(40)
    enc = projection_encoder(dim=16)
    out = model_embed(pngs, encoder=enc).toPandas()
    assert (out["ok"]).all()
    assert (out["encoder"] == "callable").all()
    assert {len(e) for e in out["embedding"]} == {16}

    local = pngs.toPandas()
    want = {
        int(r.media_id): enc(
            np.asarray([preprocess_one(bytes(r.content))], dtype=np.float32)
        )[0]
        for r in local.itertuples()
    }
    for r in out.itertuples():
        np.testing.assert_allclose(
            np.asarray(r.embedding, dtype=np.float32),
            want[int(r.media_id)],
            rtol=2e-5,
            atol=1e-5,
        )


def test_corrupt_blob_yields_error_row_not_job_failure(spark):
    good = encode_png_one(bytes(range(48)), 4, 4, "RGB")
    rows = [(1, bytearray(good)), (2, bytearray(b"not a png at all"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = (
        model_embed(df, encoder=projection_encoder(dim=4))
        .orderBy("media_id")
        .toPandas()
    )
    assert list(out["ok"]) == [True, False]
    assert out["embedding"][1] is None or out["embedding"].iloc[1] is None
    assert out["err"].iloc[1]


def test_fallback_is_byte_histogram_with_same_schema(spark, monkeypatch):
    monkeypatch.delenv(ONNX_ENV, raising=False)
    good = encode_png_one(bytes(range(48)), 4, 4, "RGB")
    df = spark.createDataFrame(
        [(1, bytearray(good))], "media_id long, content binary"
    )
    out = model_embed(df).toPandas()
    assert (out["encoder"] == "byte_histogram").all()
    assert len(out["embedding"].iloc[0]) == 16
    assert abs(sum(out["embedding"].iloc[0]) - 1.0) < 1e-5


def test_ann_over_model_embeddings_recall(spark, sf_small):
    """Composition with the similarity stack: brute-force cosine top-k
    over hook-produced embeddings must equal a local numpy reference —
    the 'ANN over real embeddings' path with the deterministic model."""
    from etl_migrate_api_spark.operators.similarity import bruteforce_topk

    pngs = _png_df(spark, sf_small).limit(60)
    emb = (
        model_embed(pngs, encoder=projection_encoder(dim=16))
        .where("ok")
        .select(F.col("media_id").alias("vec_id"), "embedding")
    ).persist()
    queries = emb.orderBy("vec_id").limit(3)
    got = bruteforce_topk(emb, queries, k=5).toPandas()

    pdf = emb.toPandas()
    X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    for qid in sorted(ids)[:3]:
        qi = int(np.where(ids == qid)[0][0])
        sims = Xn @ Xn[qi]
        best = sorted(
            ((-s, int(i)) for s, i in zip(sims, ids) if int(i) != int(qid))
        )[:5]
        want_top = {i for _, i in best}
        got_top = set(
            got[got["query_id"] == qid]["neighbor_id"].astype(int)
        )
        # ties at equal similarity make the exact id set ambiguous at
        # the k boundary; require ≥4/5 overlap
        assert len(got_top & want_top) >= 4, (qid, got_top, want_top)
    emb.unpersist()
