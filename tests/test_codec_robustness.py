"""Decoder robustness: corrupt media must raise cleanly (ValueError /
NotImplementedError / struct.error / zlib.error / EOFError-family),
never hang or return garbage silently — the property that matters when
a 100 TB crawl feeds the decode operators. Deterministic fuzz: every
truncation prefix (sampled), plus seeded byte flips."""

from __future__ import annotations

import random
import struct
import wave
import zlib

import pytest

from sqlstreamstore_spark.analytics import multimodal as mm
from sqlstreamstore_spark.analytics.avi import avi_encode, avi_info
from sqlstreamstore_spark.analytics.gif import gif_decode, gif_encode
from sqlstreamstore_spark.analytics.jpeg import jpeg_decode, jpeg_encode

ACCEPTABLE = (
    ValueError, NotImplementedError, struct.error, zlib.error, EOFError,
    IndexError, KeyError, OSError, wave.Error,
)


def _valid_payloads():
    img = mm._synth_image(3, 24, 16)
    return {
        "png": mm._png_encode(img),
        "jpeg": jpeg_encode(img, 85),
        "bmp": mm._bmp_encode(img),
        "gif": gif_encode((img // 64) * 64),
        "wav": mm._synth_wav(1, 200),
        "avi": avi_encode([img, img], fps=2),
    }


def test_truncations_raise_cleanly():
    for name, p in _valid_payloads().items():
        # every truncation in the header region + sampled tail cuts
        cuts = list(range(0, min(len(p), 64))) + list(range(64, len(p), 97))
        for cut in cuts:
            try:
                mm._decode_one(p[:cut])
            except ACCEPTABLE:
                pass
            # a short-enough prefix may still be a VALID smaller file
            # only if the format self-describes length — accept success


def test_seeded_byte_flips_never_hang():
    rng = random.Random(42)
    for name, p in _valid_payloads().items():
        for _ in range(50):
            b = bytearray(p)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                mm._decode_one(bytes(b))
            except ACCEPTABLE:
                pass
            # surviving flips that decode are fine (e.g. pixel-data
            # bits); the assertion is merely: return or raise, promptly


def test_avi_with_foreign_chunks_still_parses():
    """Reader must skip unknown LIST/chunk types (real AVIs carry INFO
    lists, JUNK padding, indexes we don't model)."""
    img = mm._synth_image(5, 16, 16)
    avi = bytearray(avi_encode([img], fps=1))
    # splice a JUNK chunk right before idx1
    junk = b"JUNK" + struct.pack("<I", 6) + b"junkda"
    idx = bytes(avi).rindex(b"idx1")
    spliced = bytes(avi[:idx]) + junk + bytes(avi[idx:])
    # RIFF size field now stale — reader clamps to len(data); frames intact
    info = avi_info(spliced)
    assert info["n_frames"] == 1 and (info["width"], info["height"]) == (16, 16)


def test_gif_decoder_rejects_truncated_lzw():
    img = (mm._synth_image(2, 10, 8) // 64) * 64
    g = bytearray(gif_encode(img))
    # cut the image data sub-blocks short: find the first data sub-block
    # after the image descriptor and zero its continuation
    with pytest.raises(ACCEPTABLE):
        gif_decode(bytes(g[: len(g) // 2]))


def test_decode_operator_surfaces_worker_errors(spark):
    """A corrupt payload inside the distributed operator fails the job
    with the decoder's error — not a silent null row."""
    rows = [
        (0, "image", "image/png", b"\x89PNG\r\n\x1a\nBROKEN", (1, 1, None, "png")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    with pytest.raises(Exception):
        mm.decode_features(media).collect()


def test_forged_dimension_headers_rejected():
    """Decompression-bomb guard: a tiny payload claiming enormous
    dimensions must raise, not allocate gigabytes."""
    img = mm._synth_image(1, 8, 8)
    # JPEG: patch SOF0 height/width to 65000x65000
    j = bytearray(jpeg_encode(img, 85))
    sof = bytes(j).index(b"\xff\xc0")
    struct.pack_into(">HH", j, sof + 5, 65000, 65000)
    with pytest.raises(ValueError):
        jpeg_decode(bytes(j))
    # PNG: patch IHDR dims (and fix the CRC so the check passes)
    png = bytearray(mm._png_encode(img))
    ihdr_at = bytes(png).index(b"IHDR")
    struct.pack_into(">II", png, ihdr_at + 4, 60000, 60000)
    crc = zlib.crc32(bytes(png[ihdr_at : ihdr_at + 4 + 13])) & 0xFFFFFFFF
    struct.pack_into(">I", png, ihdr_at + 4 + 13, crc)
    with pytest.raises(ValueError):
        mm._png_pixels(bytes(png))
    # GIF: patch the image descriptor dims
    g = bytearray(gif_encode((img // 64) * 64))
    desc = bytes(g).index(b"\x2c")
    struct.pack_into("<HH", g, desc + 5, 60000, 60000)
    with pytest.raises(ValueError):
        gif_decode(bytes(g))
