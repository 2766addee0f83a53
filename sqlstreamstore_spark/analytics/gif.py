"""GIF87a/89a decoder — pure stdlib + numpy (LZW is ~40 lines; no
external codec needed).

Rounds out the real-decode image surface next to PNG/JPEG/BMP
(``analytics/jpeg.py``, ``multimodal.py``): GIF is the one remaining
format common in scraped training corpora whose compression (LZW) the
standard library doesn't expose. Scope: single-frame decode of the
first image descriptor — global/local color tables, interlacing,
transparency via Graphic Control Extension; animated GIFs decode frame
0 (a curation pipeline treats animation as video and samples frames —
the multi-frame walk reuses ``_decode_frame`` per descriptor).

Encoder included for self-contained tests: uncompressed-style LZW
(emit literal codes with periodic clear — valid GIF, no compression
ratio), global color table from the image's unique colors (≤256).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list[int]:
    """GIF-flavor LZW: variable code width, CLEAR/EOI codes, MSB-packed
    little-endian bit order."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = nbits = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= n_expected:
                return out
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def gif_decode(data: bytes) -> np.ndarray:
    """Decode the first frame to uint8 (h, w, 4) RGBA (alpha 0 only for
    the GCE-declared transparent index, else 255)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    transparent = -1
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                size = data[pos]
                gflags = data[pos + 1]
                if gflags & 1:
                    transparent = data[pos + 4]
                pos += 1 + size
            while data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            if w * h > 64_000_000:
                raise ValueError(f"GIF dimensions too large: {w}x{h}")
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF: no color table")
            min_code = data[pos]
            pos += 1
            blocks = []
            while data[pos]:
                ln = data[pos]
                blocks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.array(
                _lzw_decode(min_code, b"".join(blocks), w * h), dtype=np.uint8
            )
            if len(idx) < w * h:
                raise ValueError("GIF: truncated image data")
            idx = idx[: w * h].reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            rgba = np.concatenate(
                [ct[idx], np.full((h, w, 1), 255, np.uint8)], axis=-1
            )
            if transparent >= 0:
                rgba[idx == transparent, 3] = 0
            return rgba
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
    raise ValueError("GIF: no image descriptor")


def gif_encode(img: np.ndarray) -> bytes:
    """Encode uint8 (h, w, 3) RGB (≤256 unique colors) as GIF89a with
    literal-code LZW (valid, uncompressed-sized)."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode: more than 256 unique colors")
    depth = max(2, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << depth, 3), np.uint8)
    table[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)

    min_code = depth
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    acc = nbits = 0
    payload = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    count = 0
    for v in idx:
        emit(int(v))
        count += 1
        # re-clear before the table would grow past the code width
        # (we never add entries, but decoders do — keep them in sync)
        if count % ((1 << width) - clear - 2) == 0:
            emit(clear)
    emit(eoi)
    if nbits:
        payload.append(acc & 0xFF)

    out.append(min_code)
    for i in range(0, len(payload), 255):
        block = payload[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
