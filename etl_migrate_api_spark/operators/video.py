"""REAL video decode for the media table: YUV4MPEG2 (Y4M) containers.

Y4M is the one video container decodable with zero third-party codecs —
a text header (``YUV4MPEG2 W.. H.. F<num>:<den> [C<colorspace>]``)
followed by ``FRAME\\n``-delimited raw planar YUV — so, like WAV for
audio and PNG/BMP/PPM for images, it lets the video path run an actual
container walk + frame extraction instead of a stub. Compressed codecs
(h264/vp9/av1) need external decoders and are env-gated exactly like
JPEG in ``multimodal.decode_pixels_one``.

Scale shape mirrors the image/audio decoders: bytes stream through
``mapInPandas`` in Arrow batches, per-frame feature rows come out, and a
corrupt blob is a ``(ok=false, err)`` row — data, not an exception.
The reference (it-center-program/etl-migrate-api) has no media surface;
this extends the engine toward multimodal training-data curation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# colorspace tag prefix -> bytes per frame as a multiple of (w*h) numerator/denominator
_CS_FRAME_FACTOR = {
    "mono": (1, 1),
    "420": (3, 2),  # 420, 420jpeg, 420mpeg2, 420paldv
    "422": (2, 1),
    "444": (3, 1),
}


def _frame_bytes(width: int, height: int, colorspace: str) -> int:
    for prefix, (num, den) in _CS_FRAME_FACTOR.items():
        if colorspace.startswith(prefix):
            size = width * height * num
            if size % den:
                raise ValueError(
                    f"odd dimensions {width}x{height} invalid for C{colorspace}"
                )
            return size // den
    raise ValueError(f"unsupported Y4M colorspace C{colorspace}")


def decode_y4m_one(
    content: bytes,
) -> tuple[int, int, int, int, str, list[bytes]]:
    """Parse one Y4M blob → ``(width, height, fps_num, fps_den,
    colorspace, y_planes)`` where ``y_planes[i]`` is frame i's raw
    luma plane (the first ``w*h`` bytes of each frame — chroma planes
    are validated for length but not returned; luma carries the signal
    features a curation gate reads)."""
    b = bytes(content)
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = -1
    fps_num, fps_den = 0, 1
    colorspace = "420jpeg"  # spec default
    for tok in b[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, _, den = val.partition(b":")
            fps_num, fps_den = int(num), int(den or b"1")
        elif tag == b"C":
            colorspace = val.decode("ascii", "replace")
        # I/A/X params are legal; none affect frame geometry
    if width <= 0 or height <= 0:
        raise ValueError("Y4M header missing W/H")
    fsize = _frame_bytes(width, height, colorspace)
    y_size = width * height
    planes: list[bytes] = []
    pos = nl + 1
    while pos < len(b):
        if b[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        fnl = b.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        data = b[fnl + 1 : fnl + 1 + fsize]
        if len(data) < fsize:
            raise ValueError(
                f"truncated frame {len(planes)}: {len(data)} < {fsize} bytes"
            )
        planes.append(data[:y_size])
        pos = fnl + 1 + fsize
    return (width, height, fps_num, fps_den, colorspace, planes)


_VIDEO_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, fps double, "
    "y_mean double, y_crc32 bigint, ok boolean, err string"
)


def decode_video(media: DataFrame, frame_stride: int = 1) -> DataFrame:
    """Per-frame luma features from real Y4M decode over ``mapInPandas``:
    one output row per sampled frame (every ``frame_stride``-th), with
    the frame's mean luma and a CRC32 of the raw luma plane (exact-
    decode proof without shipping pixels through the shuffle). A blob
    that fails to parse yields a single ``(ok=false, err)`` row.

    100 TB shape: video bytes never hit the driver; Arrow batch size
    bounds executor memory; the output is a narrow numeric table that
    downstream quality gates (static-frame detection via repeated
    y_crc32, black-frame via y_mean) aggregate with built-in exprs."""
    if frame_stride < 1:
        raise ValueError("frame_stride must be >= 1")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                try:
                    w, h, num, den, _cs, planes = decode_y4m_one(c)
                    fps = num / den if den else 0.0
                    for i in range(0, len(planes), frame_stride):
                        y = planes[i]
                        rows.append(
                            (int(mid), i, w, h, fps,
                             sum(y) / len(y) if y else 0.0,
                             zlib.crc32(y), True, None)
                        )
                except ValueError as exc:
                    rows.append(
                        (int(mid), -1, 0, 0, 0.0, 0.0, 0, False, str(exc)[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height", "fps",
                    "y_mean", "y_crc32", "ok", "err",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        decode, schema=_VIDEO_SCHEMA
    )


def video_phash_table(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """(id, lo, hi) keyframe perceptual hashes over Y4M blobs: decode
    the container (decode_y4m_one), take the FIRST frame's luma plane,
    and pHash it (multimodal.phash64_one grayscale path) — keyframe
    hashing, the standard first-pass video near-dup technique (a
    re-encoded/rescaled copy keeps its keyframe's DCT signature).
    Undecodable blobs (ValueError from the Y4M/pHash parse) are dropped
    with a per-batch count in the executor log (index builder, not
    validator); any OTHER exception propagates — a systematic bug must
    fail the job, not invisibly shrink dedup coverage. Feed to
    dedup.hamming64_pairs — the same band join as text/image/audio.
    """
    import logging

    import pandas as pd

    from etl_migrate_api_spark.operators.multimodal import phash64_one

    log = logging.getLogger(__name__)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, lows, highs = [], [], []
            dropped = 0
            for mid, c in zip(b[id_col], b[content_col]):
                try:
                    w, h, _num, _den, _cs, planes = decode_y4m_one(bytes(c))
                    if not planes:
                        dropped += 1
                        continue
                    lo, hi = phash64_one(bytes(planes[0]), w, h)
                except ValueError:
                    dropped += 1
                    continue
                ids.append(mid)
                lows.append(lo)
                highs.append(hi)
            if dropped:
                log.warning(
                    "video_phash_table: dropped %d/%d undecodable blobs",
                    dropped, len(b),
                )
            yield pd.DataFrame({"id": ids, "lo": lows, "hi": highs})

    return media.mapInPandas(run, schema="id long, lo long, hi long")
