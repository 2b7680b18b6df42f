"""REAL video decode for the media table: Y4M and MJPEG-in-AVI containers.

Y4M is the simplest container decodable with zero third-party codecs —
a text header (``YUV4MPEG2 W.. H.. F<num>:<den> [C<colorspace>]``)
followed by ``FRAME\\n``-delimited raw planar YUV. Motion-JPEG in an
AVI wrapper is the simplest COMPRESSED codec: a RIFF container walk
(same chunk grammar as the WAV parser in ``multimodal.decode_wav_one``)
whose ``00dc`` chunks are each a complete baseline JPEG, decoded by the
repo's own pure-stdlib entropy decoder (``operators/jpeg.py``). Both
flow through one dispatcher (``decode_video_one``), so every downstream
query handles a mixed-container corpus. Inter-frame codecs (h264/vp9/
av1) need external decoders and stay env-gated exactly like JPEG's PIL
fast path in ``multimodal.decode_pixels_one``.

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


# --- MJPEG-in-AVI ----------------------------------------------------------
# AVI is a RIFF form (like WAV): 'RIFF' size 'AVI ' then LIST/chunk
# tree. The structures below are the OpenDML / VfW public layouts
# (MainAVIHeader 56 bytes, AVIStreamHeader 56, BITMAPINFOHEADER 40);
# frames live in the 'movi' LIST as '00dc' chunks, each one complete
# baseline JPEG. Writing our own muxer keeps fixtures bit-reproducible
# and dependency-free, mirroring encode_jpeg for still images.


def encode_avi_mjpeg(
    frames_px: list[bytes],
    width: int,
    height: int,
    mode: str = "RGB",
    fps: int = 25,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Mux raw frames as a Motion-JPEG AVI: each frame is encoded with
    the repo's baseline JPEG encoder and wrapped in a '00dc' chunk,
    with a standard hdrl (avih + strl) header and an idx1 keyframe
    index. Pure function of its inputs — fixture AVIs are
    bit-reproducible, like ``encode_jpeg``."""
    import struct

    from etl_migrate_api_spark.operators.jpeg import encode_jpeg

    if not frames_px:
        raise ValueError("need at least one frame")
    jpegs = [
        encode_jpeg(px, width, height, mode, quality=quality,
                    subsampling=subsampling if mode == "RGB" else "444")
        for px in frames_px
    ]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(listtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", listtype + payload)

    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        max_size * fps,          # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n,                       # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_size,                # dwSuggestedBufferSize
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,              # dwFlags, wPriority, wLanguage, dwInitialFrames
        1, fps,                  # dwScale, dwRate → fps = rate/scale
        0, n,                    # dwStart, dwLength
        max_size,                # dwSuggestedBufferSize
        -1, 0,                   # dwQuality, dwSampleSize
        0, 0, width, height,     # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = bytearray()
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are from the 'movi' fourcc; first chunk sits at 4
        off = 4 + len(movi_payload)
        movi_payload += chunk(b"00dc", j)
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(j))
    movi = lst(b"movi", bytes(movi_payload))
    idx1 = chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg_one(
    content: bytes,
) -> tuple[int, int, int, int, list[bytes]]:
    """Parse one MJPEG AVI blob → ``(width, height, fps_num, fps_den,
    luma_planes)``: a real RIFF chunk walk (hdrl for geometry/rate,
    movi for frames), then the pure-stdlib baseline JPEG decode of
    every ``00dc``/``00db`` chunk. RGB frames are reduced to BT.601
    luma — the channel every downstream gate (pHash, black-frame,
    static-frame) reads, matching the Y4M path's luma-only contract."""
    import struct

    import numpy as np

    from etl_migrate_api_spark.operators.jpeg import decode_jpeg

    b = bytes(content)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    width = height = -1
    fps_num, fps_den = 0, 1
    compression = b""
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, fps_num, fps_den, compression
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            data_start = pos + 8
            data_end = data_start + size
            if data_end > end:
                raise ValueError(f"chunk {fourcc!r} overruns container")
            if fourcc == b"LIST":
                listtype = b[data_start : data_start + 4]
                walk(data_start + 4, data_end, listtype == b"movi")
            elif fourcc == b"avih" and size >= 40:
                usec, = struct.unpack("<I", b[data_start : data_start + 4])
                if usec and not fps_num:
                    fps_num, fps_den = 1_000_000, usec
                width, height = struct.unpack(
                    "<II", b[data_start + 32 : data_start + 40]
                )
            elif fourcc == b"strh" and size >= 36:
                if b[data_start : data_start + 4] == b"vids":
                    scale, rate = struct.unpack(
                        "<II", b[data_start + 20 : data_start + 28]
                    )
                    if rate:
                        fps_num, fps_den = rate, max(scale, 1)
                    compression = b[data_start + 4 : data_start + 8]
            elif fourcc == b"strf" and size >= 20 and not compression:
                compression = b[data_start + 16 : data_start + 20]
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(b[data_start:data_end])
            pos = data_end + (size % 2)  # chunks are word-aligned

    walk(12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0]), False)
    if width <= 0 or height <= 0:
        raise ValueError("AVI header missing width/height")
    if compression.upper() not in (b"MJPG", b"JPEG"):
        raise ValueError(
            f"unsupported AVI codec {compression!r} (only MJPG decodes here)"
        )
    planes: list[bytes] = []
    for i, blob in enumerate(frames):
        try:
            fw, fh, fmode, px = decode_jpeg(blob)
        except ValueError as exc:
            raise ValueError(f"frame {i}: {exc}") from exc
        if (fw, fh) != (width, height):
            raise ValueError(
                f"frame {i} is {fw}x{fh}, header says {width}x{height}"
            )
        if fmode == "L":
            planes.append(px)
        else:
            rgb = np.frombuffer(px, dtype=np.uint8).reshape(fh, fw, 3)
            y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                 + 0.114 * rgb[:, :, 2])
            planes.append(np.clip(np.rint(y), 0, 255).astype(np.uint8).tobytes())
    return (width, height, fps_num, fps_den, planes)


def decode_video_one(
    content: bytes,
) -> tuple[int, int, int, int, str, list[bytes]]:
    """Container dispatch: one blob → ``(width, height, fps_num,
    fps_den, codec, luma_planes)`` for either supported container
    (Y4M raw planar, AVI Motion-JPEG). The magic bytes decide; every
    downstream operator (decode_video, video_phash_table) calls this,
    so a mixed-container corpus is one DataFrame, not two code paths."""
    b = bytes(content)
    if b.startswith(b"YUV4MPEG2"):
        w, h, num, den, cs, planes = decode_y4m_one(b)
        return (w, h, num, den, f"y4m-{cs}", planes)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        w, h, num, den, planes = decode_avi_mjpeg_one(b)
        return (w, h, num, den, "mjpeg", planes)
    raise ValueError("unknown video container (not Y4M, not RIFF/AVI)")


_VIDEO_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, fps double, "
    "y_mean double, y_crc32 bigint, ok boolean, err string"
)


def decode_video(media: DataFrame, frame_stride: int = 1) -> DataFrame:
    """Per-frame luma features from real container decode (Y4M or MJPEG
    AVI, dispatched per blob by ``decode_video_one``) over ``mapInPandas``:
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
                    w, h, num, den, _codec, planes = decode_video_one(c)
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
    """(id, lo, hi) keyframe perceptual hashes over video blobs (Y4M or
    MJPEG AVI): decode the container (decode_video_one), take the FIRST
    frame's luma plane,
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
                    w, h, _num, _den, _codec, planes = decode_video_one(bytes(c))
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


def fake_avi_table(
    media_ids: DataFrame,
    width: int = 16,
    height: int = 16,
    n_frames: int = 3,
    fps: int = 25,
    quality: int = 90,
) -> DataFrame:
    """Deterministic REAL Motion-JPEG AVI blobs: per media_id, seeded-RNG
    RGB frames muxed by encode_avi_mjpeg (ids cycle 4:4:4 / 4:2:0 frame
    subsampling, so the JPEG decoder's chroma paths are exercised from
    inside the container too). mapInPandas — blob bytes never hit the
    driver. Input: any DataFrame with a media_id column; output
    (media_id, content binary). Mirrors multimodal.fake_jpeg_table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                rng = np.random.RandomState(mid % (2**31))
                frames = [
                    (rng.rand(height, width, 3) * 255).astype(np.uint8).tobytes()
                    for _ in range(n_frames)
                ]
                blobs.append(
                    encode_avi_mjpeg(
                        frames, width, height, "RGB", fps=fps,
                        quality=quality,
                        subsampling="420" if mid % 2 else "444",
                    )
                )
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return media_ids.select("media_id").mapInPandas(
        run, schema="media_id bigint, content binary"
    )
