"""ISO-BMFF (MP4) container codec — stdlib-only, no media libraries.

Writer (``mp4_encode``): a spec-conformant container — ``ftyp`` +
``mdat`` + a full ``moov`` box tree (mvhd / trak / tkhd / mdia / mdhd /
hdlr / minf / vmhd / dinf / stbl with stsd(avc1+avcC), stts, stsc,
stsz, stco). Sample payloads are deterministic placeholder bytes, NOT
real H.264 bitstreams: H.264 pixel decode needs a codec library that
isn't in this environment and stays honestly out of scope. Everything
the CONTAINER itself carries — duration, dimensions, frame count,
frame timing, per-sample byte ranges, codec fourcc — is real, written
and parsed per ISO/IEC 14496-12.

Parser (``mp4_probe``): a general box walk (32-bit and 64-bit largesize
boxes, boxes in any order), version-0/1 mvhd/mdhd, the full
stsc→chunk→offset sample-location algorithm (not a single-chunk
shortcut), and bounds validation of every sample range against the
file. ``sample_ranges`` lets callers random-access individual samples
without touching the rest of the payload — the same
decode-only-what-you-sample shape as the MJPEG-AVI path.

Reference parity: the reference engine (C#) has no media subsystem;
this belongs to the training-data-pipeline surface (brief: multimodal
columns — stub the codec itself, make the container plumbing real).
"""

from __future__ import annotations

import struct

_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _box(typ: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, version: int, flags: int, *payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags), *payload)


def fake_sample_bytes(media_id: int, index: int) -> bytes:
    """Deterministic placeholder sample payload (what a real encoder
    would fill with an H.264 access unit). Varies in size per index so
    stsz is a genuine per-sample table, not a constant."""
    size = 48 + (index % 5) * 4
    return bytes((media_id * 31 + index * 7 + j) % 256 for j in range(size))


def mp4_encode(
    media_id: int,
    width: int,
    height: int,
    n_frames: int,
    fps: int = 4,
    timescale: int = 1000,
) -> bytes:
    """Write a real ISO-BMFF container holding ``n_frames`` samples of
    deterministic placeholder bytes. fps must divide timescale so the
    per-sample delta is integral (fps=4 → delta 250 @ 1000)."""
    if timescale % fps:
        raise ValueError("fps must divide timescale for integral sample deltas")
    delta = timescale // fps
    duration = n_frames * delta
    samples = [fake_sample_bytes(media_id, i) for i in range(n_frames)]

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isomiso2avc1mp41")
    mdat = _box(b"mdat", b"".join(samples))
    chunk_offset = len(ftyp) + 8  # first sample starts right after the mdat header

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">i", 0x00010000),  # rate 1.0
        struct.pack(">h", 0x0100),      # volume 1.0
        b"\x00" * 10,
        _UNITY_MATRIX,
        b"\x00" * 24,
        struct.pack(">I", 2),           # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 3,  # enabled | in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration),
        b"\x00" * 8,
        struct.pack(">hhhh", 0, 0, 0, 0),  # layer, alt group, volume, reserved
        _UNITY_MATRIX,
        struct.pack(">II", width << 16, height << 16),  # 16.16 fixed point
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">Hh", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0), b"vide", b"\x00" * 12,
                 b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">Hhhh", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1))
    dinf = _box(b"dinf", dref)

    # placeholder SPS/PPS (the part a real encoder would emit; honest stub)
    sps = bytes([0x67, 0x42, 0xC0, 0x1E, media_id % 256])
    pps = bytes([0x68, 0xCE, 0x38, 0x80])
    avcc = _box(
        b"avcC",
        bytes([1, 0x42, 0xC0, 0x1E, 0xFF, 0xE1]),
        struct.pack(">H", len(sps)), sps,
        b"\x01", struct.pack(">H", len(pps)), pps,
    )
    avc1 = _box(
        b"avc1",
        b"\x00" * 6,
        struct.pack(">H", 1),            # data reference index
        struct.pack(">HH", 0, 0), b"\x00" * 12,
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x00480000, 0x00480000),  # 72 dpi
        struct.pack(">I", 0),
        struct.pack(">H", 1),            # frame count per sample
        b"\x00" * 32,                    # compressor name
        struct.pack(">Hh", 24, -1),
        avcc,
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), avc1)
    stts = _full(b"stts", 0, 0, struct.pack(">I", 1),
                 struct.pack(">II", n_frames, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 1),
                 struct.pack(">III", 1, n_frames, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n_frames),
                 b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 1), struct.pack(">I", chunk_offset))
    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)
    minf = _box(b"minf", vmhd, dinf, stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    trak = _box(b"trak", tkhd, mdia)
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, box_end); handles 64-bit largesize
    and size-0 (to end of enclosing box)."""
    off = start
    while off + 8 <= end:
        size, typ = struct.unpack_from(">I4s", buf, off)
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(f"box {typ!r} overruns its container")
        yield typ, off + hdr, off + size
        off += size


def _find(buf: bytes, start: int, end: int, typ: bytes) -> tuple[int, int] | None:
    for t, b, e in _iter_boxes(buf, start, end):
        if t == typ:
            return b, e
    return None


def is_mp4(p: bytes) -> bool:
    return len(p) >= 12 and p[4:8] == b"ftyp"


def mp4_probe(p: bytes) -> dict:
    """Parse the container: brand, movie duration, track dimensions,
    codec fourcc, frame count, per-frame timestamps, and validated
    (offset, size) byte ranges for every sample.

    The sample-location algorithm is the general one from 14496-12
    §8.7.4/§8.7.5: stsc maps samples to chunks, stco gives chunk
    offsets, stsz gives per-sample sizes; samples within a chunk are
    contiguous. Every range is bounds-checked against the buffer."""
    if not is_mp4(p):
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    n = len(p)
    brand = p[8:12].decode("ascii", "replace")

    moov = _find(p, 0, n, b"moov")
    if moov is None:
        raise ValueError("no moov box")
    ms, me = moov

    mvhd = _find(p, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box")
    v = p[mvhd[0]]
    if v == 1:
        _, _, mv_timescale, mv_duration = struct.unpack_from(">QQIQ", p, mvhd[0] + 4)
    else:
        _, _, mv_timescale, mv_duration = struct.unpack_from(">IIII", p, mvhd[0] + 4)

    trak = _find(p, ms, me, b"trak")
    if trak is None:
        raise ValueError("no trak box")
    ts_, te = trak

    tkhd = _find(p, ts_, te, b"tkhd")
    if tkhd is None:
        raise ValueError("no tkhd box")
    # width/height are the last 8 bytes of tkhd, 16.16 fixed, both versions
    w_fx, h_fx = struct.unpack_from(">II", p, tkhd[1] - 8)
    width, height = w_fx >> 16, h_fx >> 16

    mdia = _find(p, ts_, te, b"mdia")
    if mdia is None:
        raise ValueError("no mdia box")
    mdhd = _find(p, mdia[0], mdia[1], b"mdhd")
    if mdhd is None:
        raise ValueError("no mdhd box")
    v = p[mdhd[0]]
    if v == 1:
        _, _, md_timescale, md_duration = struct.unpack_from(">QQIQ", p, mdhd[0] + 4)
    else:
        _, _, md_timescale, md_duration = struct.unpack_from(">IIII", p, mdhd[0] + 4)

    minf = _find(p, mdia[0], mdia[1], b"minf")
    if minf is None:
        raise ValueError("no minf box")
    stbl = _find(p, minf[0], minf[1], b"stbl")
    if stbl is None:
        raise ValueError("no stbl box")
    sb, se = stbl

    stsd = _find(p, sb, se, b"stsd")
    codec = "?"
    if stsd is not None:
        entry_count = struct.unpack_from(">I", p, stsd[0] + 4)[0]
        if entry_count >= 1:
            codec = p[stsd[0] + 12 : stsd[0] + 16].decode("ascii", "replace")

    def _table(typ: bytes) -> tuple[int, int] | None:
        return _find(p, sb, se, typ)

    stsz = _table(b"stsz")
    if stsz is None:
        raise ValueError("no stsz box")
    fixed_size, sample_count = struct.unpack_from(">II", p, stsz[0] + 4)
    if fixed_size:
        sizes = [fixed_size] * sample_count
    else:
        sizes = list(struct.unpack_from(f">{sample_count}I", p, stsz[0] + 12))

    stco = _table(b"stco")
    co64 = _table(b"co64")
    if stco is not None:
        n_chunks = struct.unpack_from(">I", p, stco[0] + 4)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", p, stco[0] + 8))
    elif co64 is not None:
        n_chunks = struct.unpack_from(">I", p, co64[0] + 4)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", p, co64[0] + 8))
    else:
        raise ValueError("no stco/co64 box")

    stsc = _table(b"stsc")
    if stsc is None:
        raise ValueError("no stsc box")
    n_stsc = struct.unpack_from(">I", p, stsc[0] + 4)[0]
    stsc_rows = [
        struct.unpack_from(">III", p, stsc[0] + 8 + 12 * i) for i in range(n_stsc)
    ]

    # general sample→(offset, size) mapping
    ranges: list[tuple[int, int]] = []
    si = 0
    for ri, (first_chunk, per_chunk, _desc) in enumerate(stsc_rows):
        last_chunk = (
            stsc_rows[ri + 1][0] - 1 if ri + 1 < len(stsc_rows) else len(chunk_offsets)
        )
        for ci in range(first_chunk - 1, last_chunk):
            off = chunk_offsets[ci]
            for _ in range(per_chunk):
                if si >= sample_count:
                    break
                sz = sizes[si]
                if off + sz > n:
                    raise ValueError(f"sample {si} overruns the file")
                ranges.append((off, sz))
                off += sz
                si += 1
    if si != sample_count:
        raise ValueError(f"sample tables inconsistent: located {si}/{sample_count}")

    # per-frame timestamps from stts (decode deltas), in media timescale
    stts = _table(b"stts")
    if stts is None:
        raise ValueError("no stts box")
    n_stts = struct.unpack_from(">I", p, stts[0] + 4)[0]
    frame_times_ms: list[int] = []
    t = 0
    for i in range(n_stts):
        cnt, delta = struct.unpack_from(">II", p, stts[0] + 8 + 8 * i)
        for _ in range(cnt):
            frame_times_ms.append(t * 1000 // md_timescale if md_timescale else 0)
            t += delta

    return {
        "brand": brand,
        "duration_ms": int(mv_duration * 1000 // mv_timescale) if mv_timescale else 0,
        "width": int(width),
        "height": int(height),
        "codec": codec,
        "n_frames": int(sample_count),
        "timescale": int(mv_timescale),
        "frame_times_ms": frame_times_ms,
        "sample_ranges": ranges,
    }


def mp4_sample(p: bytes, probe: dict, index: int) -> bytes:
    """Random-access one sample's bytes via the validated range table —
    the only part of the payload this touches."""
    off, sz = probe["sample_ranges"][index]
    return p[off : off + sz]
