"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata structs; decode / feature-extract / frame-sample as
Arrow-batched Pandas UDFs over ``mapInPandas`` (north-star extension —
the reference has no media surface).

The container ships no image/audio libraries, so the *decode* step is a
deterministic stub (clearly marked below); everything around it — the
schema, binary handling, partitioning, UDF signatures, Arrow batch
shapes — is real and tested. A production deployment swaps
``_decode_stub`` for PIL/ffmpeg and nothing else changes.

Scale notes: media bytes never hit the driver; ``mapInPandas`` streams
Arrow batches through executors, and ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds memory per batch. Frame sampling is a pure
binary-slice expression (no Python) — substring works on BinaryType.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")


def fake_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: content bytes =
    unhex of chained md5s of the text (~64 bytes), media_type cycles by
    id, metadata is a typed struct."""
    h = F.md5("text")
    content = F.concat(
        F.unhex(h), F.unhex(F.md5(h)), F.unhex(F.md5(F.md5(h))), F.unhex(F.md5(F.md5(F.md5(h))))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        content.alias("content"),
        F.struct(
            F.length(content).alias("n_bytes"),
            F.col("source").alias("origin"),
            F.lit("fake/1.0").alias("codec"),
        ).alias("meta"),
    )


# --- decode stub -----------------------------------------------------------
# STUB: real decoders (PIL.Image.open / soundfile / av) are not in this
# container. This deterministic fake derives "dimensions" from content
# bytes so tests are stable; swap the body for the real library call.


def _decode_stub(content: bytes) -> tuple[int, int, str]:
    if content is None or len(content) == 0:
        return (0, 0, "empty")
    width = (content[0] % 32 + 1) * 16
    height = (content[1] % 32 + 1) * 16
    mode = "RGB" if content[2] % 2 == 0 else "L"
    return (width, height, mode)


_DECODE_SCHEMA = "media_id bigint, width int, height int, mode string, n_bytes int"


def decode_images(media: DataFrame) -> DataFrame:
    """Decode image metadata via mapInPandas (Arrow batches, executor-side).

    Input: (media_id, content binary); output one row per image."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_stub(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "mode": [d[2] for d in dims],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                }
            )

    return media.where(F.col("media_type") == "image").select(
        "media_id", "content"
    ).mapInPandas(decode, schema=_DECODE_SCHEMA)


_HIST_SCHEMA = "media_id bigint, features array<float>"


def byte_histogram_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction: normalized byte-value histogram as the stand-in
    embedding (mapInPandas; a real pipeline runs the vision encoder here)."""

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                if c is None or len(c) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                arr = np.frombuffer(c, dtype=np.uint8)
                counts, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                feats.append((counts / len(arr)).astype("float32").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "features": feats})

    return media.select("media_id", "content").mapInPandas(hist, schema=_HIST_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling for 'video' rows — pure binary-slice expressions
    (substring on BinaryType), one output row per frame, no Python."""
    n_frames = F.floor(F.length("content") / frame_bytes).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(F.col("content"), i * frame_bytes + 1, frame_bytes),
    )
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.posexplode(F.when(n_frames > 0, frames)).alias("frame_idx", "frame"),
        )
    )
