"""Minimal MJPEG-AVI container codec — pure stdlib, frames via jpeg.py.

Extends the real-decode surface to VIDEO: Motion-JPEG in an AVI (RIFF)
container is the one mainstream video format decodable without an
external codec library, because every frame is a baseline JPEG —
which ``analytics/jpeg.py`` decodes for real. H.264/MP4 remains the
honestly-declared stub in ``multimodal.py``.

Writer emits the canonical minimal structure:
  RIFF('AVI '){ LIST('hdrl'){ avih, LIST('strl'){ strh, strf } },
                LIST('movi'){ '00dc' × n }, 'idx1' }
Reader walks RIFF chunks tolerantly (skips unknown lists/chunks, reads
fps from strh rate/scale, dims from avih) and yields the raw JPEG bytes
per frame — decode stays the caller's choice so frame SAMPLING can skip
decoding unsampled frames entirely (the Spark operator decodes only the
timestamps it keeps).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def avi_encode(frames: list[np.ndarray], fps: int = 4, quality: int = 85) -> bytes:
    """Encode uint8 (h, w, 3) RGB frames as an MJPEG AVI."""
    from sqlstreamstore_spark.analytics.jpeg import jpeg_encode

    if not frames:
        raise ValueError("avi_encode: at least one frame")
    h, w = frames[0].shape[:2]
    jpgs = [jpeg_encode(f, quality=quality) for f in frames]
    max_jpg = max(len(j) for j in jpgs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_jpg * fps,     # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(jpgs),         # dwTotalFrames
        0, 1,              # dwInitialFrames, dwStreams
        max_jpg,           # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,        # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpgs), max_jpg, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"".join(_chunk(b"00dc", j) for j in jpgs)
    movi = _list(b"movi", movi_body)

    idx, off = b"", 4  # offsets relative to start of 'movi' fourcc data
    for j in jpgs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, data_start, data_len) for each chunk in [pos, end)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        yield tag, pos + 8, length
        pos += 8 + length + (length % 2)


def avi_info(data: bytes) -> dict:
    """Parse container metadata: width, height, fps, n_frames,
    duration_ms, and the frame (offset, length) table for stream 0."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    width = height = n_frames = 0
    rate, scale = 0, 1
    frames: list[tuple[int, int]] = []

    def walk_list(pos: int, lend: int) -> None:
        nonlocal width, height, n_frames, rate, scale
        for tag, dstart, dlen in _walk_chunks(data, pos, lend):
            if tag == b"LIST":
                ltype = data[dstart : dstart + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    if ltype == b"movi":
                        for t2, ds2, dl2 in _walk_chunks(data, dstart + 4, dstart + dlen):
                            if t2[2:4] in (b"dc", b"db") and t2[:2] == b"00":
                                frames.append((ds2, dl2))
                    else:
                        walk_list(dstart + 4, dstart + dlen)
            elif tag == b"avih":
                fields = struct.unpack_from("<14I", data, dstart)
                n_frames = fields[4]
                width, height = fields[8], fields[9]
            elif tag == b"strh" and data[dstart : dstart + 4] == b"vids":
                s = struct.unpack_from("<IIIH", data, dstart + 20)  # scale, rate, start(lo),…
                scale, rate = s[0] or 1, s[1]

    walk_list(12, end)
    fps = rate / scale if rate else 1.0
    n = n_frames or len(frames)
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": len(frames),
        "duration_ms": int(round(n * 1000.0 / fps)) if fps else 0,
        "frames": frames,
    }


def avi_frame_jpegs(data: bytes) -> list[bytes]:
    """The raw JPEG payload of every frame, in stream order."""
    return [data[o : o + ln] for o, ln in avi_info(data)["frames"]]


def avi_decode_frame(data: bytes, index: int) -> np.ndarray:
    """Decode a single frame by index — the random-access path frame
    sampling uses (unsampled frames are never even huffman-decoded)."""
    from sqlstreamstore_spark.analytics.jpeg import jpeg_decode

    off, ln = avi_info(data)["frames"][index]
    return jpeg_decode(data[off : off + ln])
