"""Env-gated model-inference embedding hook — the "real vision encoder"
slot in the multimodal pipeline (the byte-histogram in
operators/multimodal.py is honest about being a stand-in; this module
is where an actual model runs when the environment provides one).

Backend resolution order (``resolve_encoder``):

1. an explicit python callable ``(np.float32[B, F]) -> np.float32[B, D]``
   — tests and notebook users inject models this way (cloudpickle ships
   the closure to executors);
2. ``SPARK_GRAFT_ONNX_MODEL=<path>`` + importable ``onnxruntime``;
3. ``SPARK_GRAFT_TORCH_MODEL=<path>`` + importable ``torch``
   (TorchScript archive);
4. ``None`` — callers fall back to the deterministic byte-histogram.

Execution shape (the part that matters at 100 TB and is fully tested
without any ML dependency): ``model_embed`` is one ``mapInPandas`` pass
— Arrow batches in, decode → resize → normalize per row (the pure-
stdlib codecs from operators/multimodal.py), ONE batched model call per
pandas chunk (never per row), embeddings out as ``array<float>``.
Models load lazily ONCE PER EXECUTOR WORKER via a module-level cache
keyed by model path — the standard Spark inference pattern (loading per
batch would re-read the weights thousands of times; loading on the
driver would ship them through the closure).

``projection_encoder`` supplies a real, dependency-free inference
backend: a deterministic xxhash-seeded random-projection GEMM — the
same batched matrix-multiply shape as a final embedding layer, so the
whole plumbing (preprocess, batching, worker cache, ANN downstream) is
exercised in CI with bit-reproducible outputs.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame

_EMBED_SCHEMA = (
    "media_id bigint, embedding array<float>, encoder string, "
    "ok boolean, err string"
)

# per-executor-worker model cache: path -> ready callable
_MODEL_CACHE: dict[str, Callable] = {}

ONNX_ENV = "SPARK_GRAFT_ONNX_MODEL"
TORCH_ENV = "SPARK_GRAFT_TORCH_MODEL"


def resolve_encoder(
    encoder: Optional[Callable] = None,
) -> tuple[Optional[object], str]:
    """(spec, label): spec is a callable or a loader tag the executors
    resolve lazily; label names the backend for the output column. The
    import checks run on the DRIVER so a missing runtime degrades to
    the fallback before any job is launched, never as a mid-job
    executor crash."""
    if encoder is not None:
        return encoder, "callable"
    onnx_path = os.environ.get(ONNX_ENV)
    if onnx_path:
        try:
            import onnxruntime  # noqa: F401

            return ("onnx", onnx_path), f"onnx:{os.path.basename(onnx_path)}"
        except ImportError:
            pass
    torch_path = os.environ.get(TORCH_ENV)
    if torch_path:
        try:
            import torch  # noqa: F401

            return (
                ("torch", torch_path),
                f"torch:{os.path.basename(torch_path)}",
            )
        except ImportError:
            pass
    return None, "byte_histogram"


def _load_model(spec) -> Callable:
    """Executor-side lazy load, cached per worker process."""
    if callable(spec):
        return spec
    kind, path = spec
    key = f"{kind}:{path}"
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    import numpy as np

    if kind == "onnx":
        import onnxruntime as ort

        sess = ort.InferenceSession(path, providers=["CPUExecutionProvider"])
        in_name = sess.get_inputs()[0].name

        def run(x: "np.ndarray") -> "np.ndarray":
            return sess.run(None, {in_name: x.astype(np.float32)})[0]

    elif kind == "torch":
        import torch

        model = torch.jit.load(path).eval()

        def run(x: "np.ndarray") -> "np.ndarray":
            with torch.no_grad():
                return model(torch.from_numpy(x.astype(np.float32))).numpy()

    else:  # pragma: no cover - resolve_encoder only emits the two kinds
        raise ValueError(f"unknown encoder kind {kind!r}")
    _MODEL_CACHE[key] = run
    return run


def preprocess_one(content: bytes, side: int = 8) -> "list[float]":
    """bytes → flat float32 [3·side·side] in [0, 1]: full container
    decode (PNG/BMP/PPM/JPEG via the stdlib codecs), nearest-neighbor
    resize to side×side, channel-normalize to RGB (L replicates, alpha
    drops) — the canonical vision-encoder input tensor."""
    from etl_migrate_api_spark.operators.multimodal import (
        decode_pixels_one,
        resize_nearest_one,
    )

    w, h, mode, px = decode_pixels_one(content)
    ch = len(mode)
    buf = resize_nearest_one(px, w, h, ch, side, side)
    out: list[float] = []
    # mode is one of L/LA/RGB/RGBA/BGR/BGRA; emit RGB per pixel
    for i in range(side * side):
        chunk = buf[i * ch : (i + 1) * ch]
        if mode.startswith("L"):
            r = g = b = chunk[0]
        elif mode.startswith("BGR"):
            b, g, r = chunk[0], chunk[1], chunk[2]
        else:
            r, g, b = chunk[0], chunk[1], chunk[2]
        out.extend((r / 255.0, g / 255.0, b / 255.0))
    return out


def projection_encoder(dim: int = 16, side: int = 8, seed: int = 7) -> Callable:
    """Deterministic random-projection 'model': one [3·side², dim] GEMM
    with weights derived from a splitmix-style integer hash of (seed,
    row, col) — bit-reproducible everywhere, no RNG state, no deps.
    Stands in for the final projection layer of a real encoder so the
    inference plumbing and the ANN stack downstream run in CI."""
    import numpy as np

    n_in = 3 * side * side
    idx = np.arange(n_in, dtype=np.uint64)[:, None] * np.uint64(
        0x9E3779B97F4A7C15
    ) + np.arange(dim, dtype=np.uint64)[None, :] * np.uint64(
        0xBF58476D1CE4E5B9
    ) + np.uint64(seed)
    z = idx
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    w = (z.astype(np.float64) / 2**64 - 0.5).astype(np.float32)

    def run(x: "np.ndarray") -> "np.ndarray":
        return x.astype(np.float32) @ w

    return run


def model_embed(
    media: DataFrame,
    encoder: Optional[Callable] = None,
    side: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """(media_id, embedding, encoder, ok, err) for every media row —
    decode → resize → normalize → ONE batched model call per Arrow
    chunk. With no usable backend the embedding is the byte-histogram
    (same schema, ``encoder='byte_histogram'``), so pipelines compose
    identically whether or not the environment has a model."""
    spec, label = resolve_encoder(encoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        model = _load_model(spec) if spec is not None else None
        for pdf in batches:
            ids, feats, oks, errs = [], [], [], []
            for mid, c in zip(pdf[id_col], pdf[content_col]):
                ids.append(int(mid))
                if model is None:
                    if c is None or len(c) == 0:
                        feats.append(None)
                        oks.append(False)
                        errs.append("empty blob")
                        continue
                    arr = np.frombuffer(bytes(c), dtype=np.uint8)
                    counts, _ = np.histogram(arr, bins=16, range=(0, 256))
                    feats.append(
                        (counts / len(arr)).astype("float32").tolist()
                    )
                    oks.append(True)
                    errs.append(None)
                    continue
                try:
                    feats.append(preprocess_one(bytes(c), side))
                    oks.append(True)
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — corrupt blob = data
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(exc)[:200])
            if model is not None:
                good = [i for i, ok in enumerate(oks) if ok]
                if good:
                    x = np.asarray(
                        [feats[i] for i in good], dtype=np.float32
                    )
                    y = model(x)  # ONE batched inference call
                    for j, i in enumerate(good):
                        feats[i] = [float(v) for v in y[j]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "embedding": feats,
                    "encoder": label,
                    "ok": oks,
                    "err": errs,
                }
            )

    return media.select(
        media[id_col].alias("media_id"), media[content_col].alias("content")
    ).mapInPandas(run, schema=_EMBED_SCHEMA)
