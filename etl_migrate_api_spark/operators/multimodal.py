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
    """Deterministic media table derived from documents: payload bytes =
    unhex of chained md5s of the text (~64 bytes), media_type cycles by
    id, metadata is a typed struct. IMAGE rows carry a VALID PNG
    signature + IHDR chunk (width/height derived from doc_id) in front
    of the payload, so the decode step exercises real container-header
    parsing, not just plumbing."""
    h = F.md5("text")
    payload = F.concat(
        F.unhex(h), F.unhex(F.md5(h)), F.unhex(F.md5(F.md5(h))), F.unhex(F.md5(F.md5(F.md5(h))))
    )
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    w = ((F.col("doc_id") % 32) + 1) * 16
    hgt = ((F.col("doc_id") % 24) + 1) * 16
    # PNG signature ++ IHDR: len(13) 'IHDR' w h bitdepth=8 colortype=2
    # compression/filter/interlace=0 ++ 4 CRC bytes (not validated here)
    png_header = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
            F.lpad(F.hex(w), 8, "0"),
            F.lpad(F.hex(hgt), 8, "0"),
            F.lit("0802000000" + "00000000"),
        )
    )
    content = F.when(
        media_type == "image", F.concat(png_header, payload)
    ).otherwise(payload)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        content.alias("content"),
        F.struct(
            F.length(content).alias("n_bytes"),
            F.col("source").alias("origin"),
            F.lit("fake/1.0").alias("codec"),
        ).alias("meta"),
    )


# --- header decode ---------------------------------------------------------
# Container-header metadata decode is REAL, pure-stdlib byte parsing
# (PNG IHDR / BMP BITMAPINFOHEADER) — at 100 TB this is exactly how
# metadata scans work: read the first KB, never decode pixels. Full
# pixel decoders (PIL / ffmpeg) are not in this container; unknown
# containers fall back to a clearly-marked deterministic STUB so the
# Arrow plumbing stays testable. A production deployment adds the
# library call in the fallback branch and nothing else changes.


def _decode_header(content: bytes) -> tuple[int, int, str]:
    import struct

    if content is None or len(content) == 0:
        return (0, 0, "empty")
    b = bytes(content)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        width, height = struct.unpack(">II", b[16:24])
        color_type = b[25]
        mode = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}.get(color_type, "?")
        return (int(width), int(height), mode)
    if b[:2] == b"BM" and len(b) >= 26:
        width, height = struct.unpack("<ii", b[18:26])
        return (abs(int(width)), abs(int(height)), "BGR")
    # STUB fallback for pixel formats the container can't decode:
    # deterministic dims from content bytes keep tests stable (pad
    # truncated blobs so 1-2-byte content can't IndexError the task)
    p = b + b"\x00\x00\x00"
    return ((p[0] % 32 + 1) * 16, (p[1] % 32 + 1) * 16, "RGB" if p[2] % 2 == 0 else "L")


_DECODE_SCHEMA = "media_id bigint, width int, height int, mode string, n_bytes int"


def decode_images(media: DataFrame) -> DataFrame:
    """Decode image metadata via mapInPandas (Arrow batches, executor-side).

    Input: (media_id, content binary); output one row per image."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_header(c) for c in pdf["content"]]
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
