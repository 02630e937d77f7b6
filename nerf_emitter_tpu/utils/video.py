"""Dependency-free video muxing: MJPEG-in-AVI.

The reference writes mp4s with mediapy/ffmpeg
(nerfstudio/utils/render_utils.py:298-321). This environment has no
ffmpeg binary and no egress to fetch one, so trajectory renders are muxed
as MJPEG AVI — a RIFF container of per-frame JPEGs (PIL-encoded), playable
by every mainstream player. Frames can also be written alongside as PNGs
(render.py does this by default).
"""

from __future__ import annotations

import io
import struct
from pathlib import Path

import numpy as np


def _jpeg_bytes(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image

    arr = np.clip(frame, 0.0, 1.0) * 255.0 if frame.dtype != np.uint8 else frame
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, "JPEG", quality=quality)
    data = buf.getvalue()
    if len(data) % 2:
        data += b"\x00"  # RIFF chunks are word-aligned
    return data


def write_mjpeg_avi(path, frames, fps: int = 24, quality: int = 92) -> Path:
    """frames: iterable of (H, W, 3) float [0,1] or uint8 arrays."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 // fps),  # usec per frame
        max_size * fps,  # max bytes/sec
        0, 0x10,  # padding, flags (HASINDEX)
        n, 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER after fccType/fccHandler: dwFlags, wPriority,
    # wLanguage, dwInitialFrames, dwScale, dwRate, dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality, dwSampleSize (canonical 56-byte
    # payload), then rcFrame as 4 shorts.
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_size, 0xFFFFFFFF, 0
    ) + struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_chunks)

    # idx1 index: offsets relative to the start of 'movi' fourcc + 4
    idx = b""
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j)
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    path = Path(path)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return path
