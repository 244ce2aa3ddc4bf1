"""Video encoding without ffmpeg.

The reference encodes eval MP4s through imageio+ffmpeg
(/root/reference/main.py:316); this image ships no ffmpeg binary, so the
default here is an MJPEG-in-AVI writer (RIFF container by hand, JPEG frames
via Pillow) — playable by every mainstream player. If ffmpeg IS available,
``save_video`` transparently uses imageio for .mp4.
"""

from __future__ import annotations

import io
import struct
from typing import Iterable, List

import numpy as np


def _jpeg(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def write_mjpeg_avi(path: str, frames: Iterable[np.ndarray], fps: float = 50.0,
                    quality: int = 85) -> str:
    """Encode RGB uint8 frames (H,W,3) as MJPEG inside an AVI container."""
    jpegs: List[bytes] = []
    h = w = None
    for f in frames:
        f = np.ascontiguousarray(f)
        if h is None:
            h, w = f.shape[:2]
        jpegs.append(_jpeg(f, quality))
    if not jpegs:
        raise ValueError("no frames")
    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 / fps),      # usec per frame
        max_size * int(fps), # max bytes/s
        0,                   # padding granularity
        0x10,                # AVIF_HASINDEX
        n, 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: type, handler, flags, priority, language, initialFrames,
    # scale, rate, start, length, suggestedBuffer, quality, sampleSize, rcFrame
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, int(round(fps)), 0, n, max_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    # BITMAPINFOHEADER
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)

    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b""
    index = b""
    offset = 4  # after 'movi' fourcc
    for j in jpegs:
        c = chunk(b"00dc", j)
        index += b"00dc" + struct.pack("<3I", 0x10, offset, len(j))
        offset += len(c)
        movi_payload += c
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", index)

    body = hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body)
    return path


def save_video(path: str, frames: Iterable[np.ndarray], fps: float = 50.0) -> str:
    """MP4 via imageio/ffmpeg when present, else MJPEG AVI (swaps extension)."""
    frames = list(frames)
    if path.endswith(".mp4"):
        try:
            import imageio

            with imageio.get_writer(path, fps=fps) as wtr:
                for f in frames:
                    wtr.append_data(f)
            return path
        except Exception:
            path = path[:-4] + ".avi"
    if not path.endswith(".avi"):
        path += ".avi"
    return write_mjpeg_avi(path, frames, fps=fps)
