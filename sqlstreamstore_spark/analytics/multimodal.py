"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side plumbing (schema, partitioning, mapInPandas batch shape,
UDF signatures) is real and tested. Decoding is REAL for PNG (zlib
inflate + full scanline de-filtering incl. Paeth), BMP (24-bit BI_RGB),
GIF (own LZW, ``analytics/gif.py``), baseline JPEG (own Huffman+IDCT
codec, ``analytics/jpeg.py``), WAV (PCM via ``wave``) and MJPEG-AVI
video (``analytics/avi.py``) — no external libs — including real
nearest-neighbor resize with re-encode in the source format and real
sampled-frame extraction. MP4 is a real ISO-BMFF container walk
(``analytics/mp4.py``: moov/trak/stbl parse, general stsc sample
location, bounds-checked random access) — container-level metadata,
frame timing and per-sample byte ranges are real; only the H.264
BITSTREAM inside the samples stays a deterministic stub (pixel decode
needs a codec library; swap in pyav in production — the dataflow does
not change). The legacy FAKEMEDIA header format remains decodable for
synthetic corner-case tests.

Scale design: media bytes never pass through the driver; rows flow
partition-by-partition through mapInPandas with a bounded Arrow batch
size (spark.sql.execution.arrow.maxRecordsPerBatch governs memory — for
multi-MB payloads set it low, e.g. 32). Feature extraction keeps columns
narrow: select() away the payload as soon as the features are computed,
so downstream shuffles move only features, not bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata travels next to the opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"FAKEMEDIA"  # deterministic fake header: MAGIC | kind(1B) | w | h | dur


def encode_fake_media(media_id: int, kind: str, width: int, height: int, duration_ms: int) -> bytes:
    """Deterministic fake payload for tests (stands in for real bytes)."""
    kind_b = {"image": 0, "audio": 1, "video": 2}[kind]
    body = bytes((media_id * 7 + i) % 256 for i in range(64))
    return _MAGIC + struct.pack("<BIII", kind_b, width, height, duration_ms) + body


def _synth_image(i: int, w: int, h: int):
    """Deterministic smooth RGB gradient (varies per media_id)."""
    import numpy as np

    yy = np.arange(h).reshape(-1, 1)
    xx = np.arange(w).reshape(1, -1)
    r = (yy * 3 + xx * 2 + i * 17) % 256
    g = (yy * 1 + xx * 5 + i * 29) % 256
    b = (yy * 4 + xx * 1 + i * 43) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _synth_wav(i: int, duration_ms: int, rate: int = 8000) -> bytes:
    """Deterministic PCM-16 mono WAV of exactly duration_ms."""
    import io
    import wave

    import numpy as np

    n = rate * duration_ms // 1000
    t = np.arange(n, dtype=np.float64)
    pcm = (np.sin(t * (0.01 + 0.001 * (i % 10))) * 3000.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


#: image rows cycle through the four real codecs
_IMG_FORMATS = ("png", "jpeg", "bmp", "gif")


def make_media_payload(i: int, kind: str, w: int, h: int, d: int) -> tuple[bytes, str, str]:
    """(payload, mime, codec) for one synthetic media row. REAL bytes
    for every decodable format — PNG/JPEG/BMP/GIF images, PCM WAV
    audio, MJPEG-AVI for half the video rows (the rest keep the
    FAKEMEDIA MP4 stub). Shared by
    ``make_fake_media_df`` and the registry's golden-oracle generator so
    the driver-checked expected values always track the real payloads."""
    if kind == "image":
        fmt = _IMG_FORMATS[(i // 3) % len(_IMG_FORMATS)]
        img = _synth_image(i, w, h)
        if fmt == "png":
            return _png_encode(img), "image/png", "png"
        if fmt == "jpeg":
            from sqlstreamstore_spark.analytics.jpeg import jpeg_encode

            return jpeg_encode(img, quality=85), "image/jpeg", "jpeg"
        if fmt == "gif":
            from sqlstreamstore_spark.analytics.gif import gif_encode

            # posterize to respect the 256-color palette bound
            return gif_encode((img // 64) * 64), "image/gif", "gif"
        return _bmp_encode(img), "image/bmp", "bmp"
    if kind == "audio":
        return _synth_wav(i, d), "audio/wav", "pcm_s16le"
    if (i // 3) % 2 == 0:
        # real MJPEG-AVI video: n frames at 4 fps ≈ the nominal duration
        from sqlstreamstore_spark.analytics.avi import avi_encode

        n_frames = max(1, round(d * 4 / 1000))
        frames = [_synth_image(i * 8 + f, 32, 24) for f in range(n_frames)]
        return avi_encode(frames, fps=4), "video/x-msvideo", "mjpeg"
    # real ISO-BMFF container (stub H.264 sample payloads — see mp4.py)
    from sqlstreamstore_spark.analytics.mp4 import mp4_encode

    n_frames = max(1, round(d * 4 / 1000))
    return mp4_encode(i, w, h, n_frames, fps=4), "video/mp4", "avc1"


_MEDIA_ROWS_CACHE: dict[int, list] = {}
_MEDIA_DF_CACHE: dict[tuple[int, int], DataFrame] = {}


def make_fake_media_df(spark: SparkSession, n: int = 100) -> DataFrame:
    """Synthesize a deterministic media table with the canonical schema.
    Payloads are REAL encoded media (PNG/JPEG/BMP/GIF/WAV, and
    MJPEG-AVI for half the video rows); only MP4 keeps the FAKEMEDIA
    stub header. Both the rows AND the cached DataFrame are memoized
    per (session, n): eight gate queries share this table, and the
    driver-side codec encodes plus the createDataFrame ship were the
    dominant per-query cost."""
    key = (id(spark), n)
    cached = _MEDIA_DF_CACHE.get(key)
    if cached is not None:
        return cached
    kinds = ["image", "audio", "video"]
    rows = _MEDIA_ROWS_CACHE.get(n)
    if rows is None:
        specs = [
            (i, kinds[i % 3], 64 + i % 32, 48 + i % 24, 1000 + i * 10)
            for i in range(n)
        ]
        # r12 optimization: the pure-Python codec encodes are
        # independent per row and were the dominant cost of this
        # builder (~4 s serial for 100 rows) — fan them out over a
        # fork pool, order preserved by starmap so the table is
        # byte-identical to the serial build. Fork keeps the parent's
        # imports (spawn would re-import pyspark per worker); the
        # children never touch the JVM/py4j. Serial fallback if the
        # platform lacks fork.
        payloads: list[tuple[bytes, str, str]] | None = None
        try:
            import multiprocessing as _mp
            import os as _os

            with _mp.get_context("fork").Pool(
                min(8, _os.cpu_count() or 1)
            ) as _pool:
                payloads = _pool.starmap(make_media_payload, specs)
        except (ImportError, ValueError, OSError):
            payloads = None
        if payloads is None:
            payloads = [make_media_payload(*s) for s in specs]
        rows = []
        for (i, kind, w, h, d), (payload, mime, codec) in zip(specs, payloads):
            rows.append(
                (
                    i,
                    kind,
                    mime,
                    payload,
                    (w if kind == "image" else None, h if kind == "image" else None,
                     d if kind != "image" else None, codec),
                )
            )
        _MEDIA_ROWS_CACHE[n] = rows
    # Right-size partitions to the data: a tiny demo table across the
    # session's full default parallelism would spawn one Python worker per
    # (near-empty) partition in the downstream mapInPandas. Real media
    # tables arrive already partitioned by the source.
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32 or 1))
    # r12 optimization: ship the rows over the Arrow path (pandas input
    # → one Arrow batch) instead of the pickled-row path — the
    # per-row pickle serde was ~5 s of the build at n=100 vs ~0.5 s via
    # Arrow (guide §6 "Arrow for driver transfers"); same schema, same
    # values, verified row-identical.
    import pandas as _pd

    pdf = _pd.DataFrame(
        {
            "media_id": [r[0] for r in rows],
            "kind": [r[1] for r in rows],
            "mime": [r[2] for r in rows],
            "payload": [r[3] for r in rows],
            "meta": [
                {
                    "width": r[4][0],
                    "height": r[4][1],
                    "duration_ms": r[4][2],
                    "codec": r[4][3],
                }
                for r in rows
            ],
        }
    )
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA).coalesce(n_parts).cache()
    _MEDIA_DF_CACHE[key] = df
    return df


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_pixels(p: bytes):
    """Real PNG decode (stdlib only): chunk walk with CRC verification,
    zlib inflate, scanline de-filtering (filters 0-4 incl. Paeth).
    Supports 8-bit gray/RGB/RGBA, non-interlaced — the shapes a training
    pipeline normalizes to anyway. Returns uint8 ndarray (h, w, ch)."""
    import zlib

    import numpy as np

    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos < len(p):
        (length,) = struct.unpack_from(">I", p, pos)
        tag = p[pos + 4 : pos + 8]
        data = p[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", p, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG: missing IHDR chunk (truncated or corrupt)")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if w * h > 64_000_000:
        # decompression-bomb guard (forged IHDR dims vs tiny IDAT)
        raise ValueError(f"PNG dimensions too large: {w}x{h}")
    if depth != 8 or interlace != 0:
        raise NotImplementedError("PNG: only 8-bit non-interlaced supported")
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if ch is None:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        prev = out[r - 1] if r else np.zeros(stride, np.uint8)
        if f == 0:
            cur = line
        elif f == 2:  # up — uint8 addition wraps mod 256
            cur = line + prev
        else:
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:  # 4: Paeth
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        out[r] = cur
    return out.reshape(h, w, ch)


def _png_encode(img) -> bytes:
    """Minimal valid PNG writer (filter 0 rows, one IDAT)."""
    import zlib

    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def _bmp_pixels(p: bytes):
    """Real BMP decode (24-bit uncompressed BI_RGB): returns uint8
    ndarray (h, w, 3) in file (BGR) channel order, top-down."""
    import numpy as np

    (pix_off,) = struct.unpack_from("<I", p, 10)
    w, h_signed = struct.unpack_from("<ii", p, 18)
    (bpp,) = struct.unpack_from("<H", p, 28)
    if bpp != 24:
        raise NotImplementedError("BMP: only 24-bit BI_RGB supported")
    top_down, h = h_signed < 0, abs(h_signed)
    stride = (w * 3 + 3) & ~3
    arr = (
        np.frombuffer(p, np.uint8, stride * h, pix_off)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    return arr if top_down else arr[::-1]


def _bmp_encode(img) -> bytes:
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = b"".join(img[r].tobytes() + pad for r in range(h - 1, -1, -1))
    pix_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


def _wav_info(p: bytes) -> tuple[int, bytes]:
    """Real WAV decode via the stdlib ``wave`` module: (duration_ms,
    PCM frame bytes)."""
    import io
    import wave

    with wave.open(io.BytesIO(p)) as wf:
        n, rate = wf.getnframes(), wf.getframerate()
        pcm = wf.readframes(n)
    return int(round(n * 1000 / rate)), pcm


def _nearest_resize(img, width: int, height: int):
    """Nearest-neighbor resample by index mapping — exact and
    dependency-free."""
    import numpy as np

    h, w = img.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return np.ascontiguousarray(img[rows][:, cols])


def _decode_one(payload: bytes) -> dict:
    """Per-payload decoder: REAL for PNG/BMP/WAV (stdlib), FAKEMEDIA
    header for everything else (JPEG/MP4 need external codecs; swap in
    PIL/pyav here — the mapInPandas dataflow does not change).
    ``checksum`` is over the DECODED bytes (pixels / PCM), so it proves
    the decode actually ran."""
    p = bytes(payload) if payload is not None else b""
    if p.startswith(_MAGIC):
        kind_b, w, h, d = struct.unpack_from("<BIII", p, len(_MAGIC))
        body = p[len(_MAGIC) + 13 :]
        return {
            "decoded_kind": ["image", "audio", "video"][kind_b],
            "width": w,
            "height": h,
            "duration_ms": d,
            "n_bytes": len(p),
            "checksum": sum(body) % 65536,
        }
    if p[:2] == b"BM":
        img = _bmp_pixels(p)
        return {
            "decoded_kind": "image",
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "duration_ms": None,
            "n_bytes": len(p),
            "checksum": int(img.sum()) % 65536,
        }
    if p[:8] == _PNG_SIG:
        img = _png_pixels(p)
        return {
            "decoded_kind": "image",
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "duration_ms": None,
            "n_bytes": len(p),
            "checksum": int(img.sum()) % 65536,
        }
    if p[:2] == b"\xff\xd8":
        from sqlstreamstore_spark.analytics.jpeg import jpeg_decode

        img = jpeg_decode(p)
        return {
            "decoded_kind": "image",
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "duration_ms": None,
            "n_bytes": len(p),
            "checksum": int(img.sum()) % 65536,
        }
    if p[:6] in (b"GIF87a", b"GIF89a"):
        from sqlstreamstore_spark.analytics.gif import gif_decode

        img = gif_decode(p)  # (h, w, 4) RGBA
        return {
            "decoded_kind": "image",
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "duration_ms": None,
            "n_bytes": len(p),
            "checksum": int(img.sum()) % 65536,
        }
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        from sqlstreamstore_spark.analytics.avi import avi_frame_jpegs, avi_info
        from sqlstreamstore_spark.analytics.jpeg import jpeg_decode

        info = avi_info(p)
        csum = 0
        for j in avi_frame_jpegs(p):
            csum = (csum + int(jpeg_decode(j).sum())) % 65536
        return {
            "decoded_kind": "video",
            "width": info["width"],
            "height": info["height"],
            "duration_ms": info["duration_ms"],
            "n_bytes": len(p),
            "checksum": csum,
        }
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        duration_ms, pcm = _wav_info(p)
        return {
            "decoded_kind": "audio",
            "width": None,
            "height": None,
            "duration_ms": duration_ms,
            "n_bytes": len(p),
            "checksum": sum(pcm) % 65536,
        }
    from sqlstreamstore_spark.analytics.mp4 import is_mp4, mp4_probe

    if is_mp4(p):
        info = mp4_probe(p)
        # checksum over the located sample bytes proves the stsc/stco/
        # stsz walk ran and every range was in-bounds (pixels would need
        # an H.264 decoder — honestly out of scope)
        csum = 0
        for off, sz in info["sample_ranges"]:
            csum = (csum + sum(p[off : off + sz])) % 65536
        return {
            "decoded_kind": "video",
            "width": info["width"],
            "height": info["height"],
            "duration_ms": info["duration_ms"],
            "n_bytes": len(p),
            "checksum": csum,
        }
    raise NotImplementedError(
        "no decoder for this payload: PNG/BMP/GIF/WAV (stdlib), baseline "
        "JPEG (analytics/jpeg.py), MJPEG-AVI and ISO-BMFF MP4 metadata "
        "(analytics/mp4.py) decode for real; other formats need external "
        "codecs (unavailable in this environment)"
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded_kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.IntegerType(), False),
    ]
)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: payload in, narrow features out.
    The payload column dies inside the operator — only features shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(run, DECODED_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _resize_payload(mid: int, p: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample + re-encode in the source format —
    REAL for PNG, BMP and baseline JPEG; FAKEMEDIA headers get their
    dims rewritten (the stub stand-in for codec-only formats)."""
    if p.startswith(_MAGIC):
        d = _decode_one(p)
        return encode_fake_media(mid, "image", width, height, d["duration_ms"])
    if p[:2] == b"BM":
        return _bmp_encode(_nearest_resize(_bmp_pixels(p), width, height))
    if p[:8] == _PNG_SIG:
        return _png_encode(_nearest_resize(_png_pixels(p), width, height))
    if p[:2] == b"\xff\xd8":
        from sqlstreamstore_spark.analytics.jpeg import jpeg_decode, jpeg_encode

        return jpeg_encode(_nearest_resize(jpeg_decode(p), width, height), quality=85)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        from sqlstreamstore_spark.analytics.gif import gif_decode, gif_encode

        # palette formats re-encode from the RGB planes (nearest-neighbor
        # adds no new colors, so the palette bound still holds);
        # GCE transparency doesn't survive a resize — curation pipelines
        # flatten alpha anyway
        return gif_encode(_nearest_resize(gif_decode(p)[:, :, :3], width, height))
    raise NotImplementedError("resize: unsupported image format")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize pipeline stage. REAL nearest-neighbor resample +
    re-encode for PNG, BMP and baseline JPEG payloads (stdlib + numpy
    codecs); FAKEMEDIA payloads get their header dims rewritten (the
    stub stand-in for codec formats). Filter + transform runs fully
    parallel; non-images are filtered out BEFORE the UDF so the Python
    worker only sees relevant rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _resize_payload(int(mid), bytes(p), width, height)
                for mid, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, RESIZE_SCHEMA)
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (explode of a generated timestamp sequence — the Spark-side
    shape of frame extraction; actual frame decode is the stub)."""
    frames = media.filter(
        (F.col("kind") == "video") & (F.col("meta.duration_ms") > 0)
    ).select(
        # zero/negative durations have no frames — and sequence(0, -1)
        # throws "illegal sequence boundaries" under ANSI, so the guard
        # is correctness, not just semantics
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn(
        "frame_id",
        F.concat_ws("-", F.col("media_id").cast("string"), F.col("frame_ts_ms").cast("string")),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
        T.StructField("spectral_centroid_hz", T.DoubleType(), False),
        T.StructField("dominant_freq_hz", T.DoubleType(), False),
    ]
)


def _audio_features_one(mid: int, p: bytes) -> dict:
    """Real DSP over a PCM WAV payload: RMS energy, zero-crossing rate,
    spectral centroid and dominant frequency via numpy rfft — the
    feature row an audio curation pipeline filters on (silence, tone,
    clipping detection). Deterministic: pure float64 numpy on the
    payload bytes, no windowing."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(p)) as wf:
        n, rate, width = wf.getnframes(), wf.getframerate(), wf.getsampwidth()
        ch = wf.getnchannels()
        pcm = wf.readframes(n)
    if width != 2:
        raise NotImplementedError("audio features: 16-bit PCM only")
    x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    n_samples = len(x)
    if n_samples == 0:
        rms = zcr = centroid = dominant = 0.0
    else:
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n_samples
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n_samples, d=1.0 / rate)
        denom = float(spec.sum())
        centroid = float((freqs * spec).sum() / denom) if denom else 0.0
        dominant = float(freqs[int(spec.argmax())])
    return {
        "media_id": mid,
        "duration_ms": int(round(n_samples * 1000 / rate)) if rate else 0,
        "n_samples": n_samples,
        "sample_rate": rate,
        "rms": rms,
        "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid,
        "dominant_freq_hz": dominant,
    }


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction as a Spark operator: WAV payloads in,
    one narrow DSP feature row out per clip (mapInPandas; non-audio
    rows are filtered before the Python worker ever sees them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _audio_features_one(int(mid), bytes(p))
                for mid, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, AUDIO_FEATURES_SCHEMA)
    )


EXTRACTED_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("checksum", T.IntegerType(), False),
    ]
)


def _extract_frames_one(mid: int, p: bytes, every_ms: int) -> list[dict]:
    """REAL frame extraction for MJPEG-AVI: sample timestamps every
    every_ms, decode ONLY the sampled frames (random access via the
    container's frame table — unsampled frames are never
    huffman-decoded). FAKEMEDIA video yields deterministic pseudo-frames
    from the stub header (the honest stand-in for codec formats)."""
    out = []
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        from sqlstreamstore_spark.analytics.avi import avi_info
        from sqlstreamstore_spark.analytics.jpeg import jpeg_decode

        info = avi_info(p)
        ms_per_frame = 1000.0 / info["fps"]
        for ts in range(0, max(info["duration_ms"], 0), every_ms):
            idx = min(int(ts / ms_per_frame), info["n_frames"] - 1)
            off, ln = info["frames"][idx]
            img = jpeg_decode(p[off : off + ln])
            out.append(
                {
                    "media_id": mid,
                    "frame_ts_ms": ts,
                    "frame_index": idx,
                    "width": int(img.shape[1]),
                    "height": int(img.shape[0]),
                    "checksum": int(img.sum()) % 65536,
                }
            )
        return out
    from sqlstreamstore_spark.analytics.mp4 import is_mp4, mp4_probe, mp4_sample

    if is_mp4(p):
        # container-level extraction: frame index/timing from stts, dims
        # from tkhd, random access into mdat via the validated sample
        # table. Checksum is over the SAMPLE BYTES (an H.264 access
        # unit in a real file) — pixel decode stays stubbed.
        info = mp4_probe(p)
        nf = info["n_frames"]
        if nf == 0 or info["duration_ms"] <= 0:
            return out
        ms_per_frame = info["duration_ms"] / nf
        for ts in range(0, info["duration_ms"], every_ms):
            idx = min(int(ts / ms_per_frame), nf - 1)
            sample = mp4_sample(p, info, idx)
            out.append(
                {
                    "media_id": mid,
                    "frame_ts_ms": ts,
                    "frame_index": idx,
                    "width": info["width"],
                    "height": info["height"],
                    "checksum": sum(sample) % 65536,
                }
            )
        return out
    if p.startswith(_MAGIC):
        kind_b, w, h, d = struct.unpack_from("<BIII", p, len(_MAGIC))
        body = p[len(_MAGIC) + 13 :]
        base = sum(body) % 65536
        for i, ts in enumerate(range(0, d, every_ms)):
            out.append(
                {
                    "media_id": mid,
                    "frame_ts_ms": ts,
                    "frame_index": i,
                    "width": w,
                    "height": h,
                    "checksum": (base + ts) % 65536,
                }
            )
        return out
    raise NotImplementedError("frame extraction: MJPEG-AVI, MP4 or FAKEMEDIA only")


def extract_video_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Real frame extraction as a Spark operator: video payloads in,
    narrow per-frame features out via mapInPandas. MJPEG-AVI rows
    random-access and decode only the sampled frames; the payload
    column dies inside the operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rows.extend(_extract_frames_one(int(mid), bytes(p), every_ms))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in EXTRACTED_FRAME_SCHEMA.fields],
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, EXTRACTED_FRAME_SCHEMA)
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque binary payload —
    the bridging shape for mixed text/media corpora (and the one media
    query the DuckDB oracle can check, since the payload derives from a
    fixture table rather than synthesized rows)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.lit("text/plain").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


PAYLOAD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
    ]
)


def payload_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched binary feature extraction with a checkable result:
    byte length + md5 digest per payload via mapInPandas (the exact
    dataflow a real decoder uses — bytes stay executor-side, only
    narrow features come out; DuckDB computes identical values from the
    source text, so this one IS oracled, unlike the stubbed decodes)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, PAYLOAD_STATS_SCHEMA)


# ------------------------------------------------------------ image dedup

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.LongType(), False),
    ]
)


def _image_pixels(p: bytes):
    """Decode any supported image payload to an RGB(A) uint8 array."""
    if p[:2] == b"BM":
        return _bmp_pixels(p)
    if p[:8] == _PNG_SIG:
        return _png_pixels(p)
    if p[:2] == b"\xff\xd8":
        from sqlstreamstore_spark.analytics.jpeg import jpeg_decode

        return jpeg_decode(p)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        from sqlstreamstore_spark.analytics.gif import gif_decode

        return gif_decode(p)[:, :, :3]
    raise NotImplementedError("image hash: unsupported image format")


def _ahash_one(p: bytes) -> int:
    """64-bit average-hash over the DECODED pixels: grayscale (channel
    mean), nearest-resize to 8x8, threshold at the mean — the classic
    aHash. Codec-invariant by construction: a PNG and a JPEG of the
    same picture land within a few Hamming bits, which is exactly what
    near-dup detection wants (byte-level md5 can never see that).
    Row-major bit order, bit63 = pixel (0,0); returned as SIGNED int64
    (Spark LongType twos-complement)."""
    import numpy as np

    img = _image_pixels(bytes(p))
    gray = img.astype(np.float64).mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    small = _nearest_resize(gray[:, :, None], 8, 8)[:, :, 0]
    bits = (small > small.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return int(np.int64(np.uint64(v)))  # wrap to signed


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual hash per image row (mapInPandas; payload dies inside
    the operator — only an 8-byte hash shuffles, the property that
    makes image dedup tractable at 100 TB)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": [_ahash_one(p) for p in pdf["payload"]],
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, AHASH_SCHEMA)
    )


def image_near_dup_pairs(media: DataFrame, max_hamming: int = 10) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance,
    quarter-banded like SimHash (dedup.py): candidates are pairs
    sharing at least one identical 16-bit band of the 64-bit hash, so
    generation is a band equi-join — never an all-pairs scan — and the
    exact ``bit_count(xor)`` filter runs on candidates only. Pigeonhole
    guarantee: ≤3 differing bits can touch at most 3 of the 4 bands, so
    recall is exact for max_hamming ≤ 3 (the classic SimHash block
    scheme); beyond that the band join is probabilistic recall, like
    every LSH — add banding rotations for higher guaranteed radii."""
    hashes = image_ahash(media).localCheckpoint()  # tiny: (id, int64)
    bands = hashes.select(
        "media_id",
        F.col("ahash"),
        F.posexplode(
            F.array(*[
                F.shiftright("ahash", s).bitwiseAND(F.lit(0xFFFF).cast("long")).alias(f"b{i}")
                for i, s in enumerate((0, 16, 32, 48))
            ])
        ).alias("band_id", "band_val"),
    )
    a = bands.select(
        F.col("media_id").alias("id_a"), F.col("ahash").alias("ha"),
        "band_id", "band_val")
    b = bands.select(
        F.col("media_id").alias("id_b"), F.col("ahash").alias("hb"),
        "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def _video_frame_hashes_one(mid: int, p: bytes, every_ms: int) -> list[tuple[int, int, int]]:
    """(media_id, frame_ts_ms, ahash) rows for one video payload —
    MJPEG-AVI decodes the sampled frames for real; FAKEMEDIA rows hash
    their deterministic stub header per frame index. Shared by the
    operator and the registry's golden generator."""
    import numpy as np

    out: list[tuple[int, int, int]] = []
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        from sqlstreamstore_spark.analytics.avi import avi_info
        from sqlstreamstore_spark.analytics.jpeg import jpeg_decode

        info = avi_info(p)
        ms_per_frame = 1000.0 / info["fps"]
        for ts in range(0, max(info["duration_ms"], 0), every_ms):
            idx = min(int(ts / ms_per_frame), info["n_frames"] - 1)
            off, ln = info["frames"][idx]
            img = jpeg_decode(p[off : off + ln])
            gray = img.astype(np.float64).mean(axis=2)
            small = _nearest_resize(gray[:, :, None], 8, 8)[:, :, 0]
            bits = (small > small.mean()).flatten()
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            out.append((mid, ts, int(np.int64(np.uint64(v)))))
        return out
    from sqlstreamstore_spark.analytics.mp4 import is_mp4, mp4_probe, mp4_sample

    if is_mp4(p):
        # container-level stand-in fingerprint: 62-bit md5 of the
        # sample's bytes. Identical samples (true duplicates) collide
        # exactly; it is NOT perceptual (that needs H.264 pixel decode).
        import hashlib

        info = mp4_probe(p)
        nf = info["n_frames"]
        if nf == 0 or info["duration_ms"] <= 0:
            return out
        ms_per_frame = info["duration_ms"] / nf
        for ts in range(0, info["duration_ms"], every_ms):
            idx = min(int(ts / ms_per_frame), nf - 1)
            digest = hashlib.md5(mp4_sample(p, info, idx)).digest()
            out.append((mid, ts, int.from_bytes(digest[:8], "big") % (1 << 62)))
        return out
    if p.startswith(_MAGIC):
        kind_b, w, h, d = struct.unpack_from("<BIII", p, len(_MAGIC))
        base = sum(p[len(_MAGIC) + 13 :]) % (1 << 62)
        for i, ts in enumerate(range(0, d, every_ms)):
            out.append((mid, ts, (base * 31 + i) % (1 << 62)))
        return out
    raise NotImplementedError("video frame hash: MJPEG-AVI, MP4 or FAKEMEDIA only")


def video_frame_ahashes(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Per-sampled-frame perceptual hash for video rows. Output:
    (media_id, frame_ts_ms, ahash) — the narrow frame-fingerprint
    table video dedup joins on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int]] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                rows.extend(_video_frame_hashes_one(int(mid), bytes(p), every_ms))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "ahash"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(
            run,
            T.StructType([
                T.StructField("media_id", T.LongType(), False),
                T.StructField("frame_ts_ms", T.IntegerType(), False),
                T.StructField("ahash", T.LongType(), False),
            ]),
        )
    )


def video_near_dup_pairs(
    media: DataFrame, every_ms: int = 500, max_hamming: int = 3, min_shared_frames: int = 2
) -> DataFrame:
    """Near-duplicate VIDEO pairs: two videos are near-dups when at
    least ``min_shared_frames`` of their sampled frames are perceptual
    near-dups (banded Hamming, like image_near_dup_pairs). The frame
    band equi-join keys the shuffle — an all-pairs video comparison
    never happens — and only (id, ts, 8-byte hash) rows move.

    Output: (id_a, id_b, n_shared_frames, min_hamming)."""
    hashes = video_frame_ahashes(media, every_ms).localCheckpoint()
    bands = hashes.select(
        "media_id", "frame_ts_ms", "ahash",
        F.posexplode(
            F.array(*[
                F.shiftright("ahash", s).bitwiseAND(F.lit(0xFFFF).cast("long"))
                for s in (0, 16, 32, 48)
            ])
        ).alias("band_id", "band_val"),
    )
    a = bands.select(F.col("media_id").alias("id_a"), F.col("frame_ts_ms").alias("ts_a"),
                     F.col("ahash").alias("ha"), "band_id", "band_val")
    b = bands.select(F.col("media_id").alias("id_b"), F.col("frame_ts_ms").alias("ts_b"),
                     F.col("ahash").alias("hb"), "band_id", "band_val")
    frame_pairs = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        # distinct over the FRAME pair (not the hash pair): several
        # frames matching at the same hash are several shared frames
        .select(
            "id_a", "id_b", "ts_a", "ts_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return (
        frame_pairs.groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_shared_frames"),
            F.min("hamming").alias("min_hamming"),
        )
        .filter(F.col("n_shared_frames") >= min_shared_frames)
        .orderBy("id_a", "id_b")
    )


MP4_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("brand", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("duration_ms", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("data_bytes", T.LongType(), False),
    ]
)


def mp4_container_metadata(media: DataFrame) -> DataFrame:
    """ISO-BMFF metadata extraction as a Spark operator: MP4 payloads
    in, one narrow container-fact row out (mapInPandas; non-MP4 rows
    are filtered by mime before the Python worker sees them). The walk
    is the real 14496-12 parse (analytics/mp4.py): movie duration from
    mvhd, dimensions from tkhd, codec fourcc from stsd, frame count
    from stsz, and data_bytes as the sum of every located-and-validated
    sample range — a training-data pipeline's 'probe' pass (ffprobe
    shape) without decoding a single pixel."""
    from sqlstreamstore_spark.analytics.mp4 import mp4_probe

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                info = mp4_probe(bytes(p))
                rows.append(
                    (
                        int(mid), info["brand"], info["codec"], info["width"],
                        info["height"], info["duration_ms"], info["n_frames"],
                        sum(sz for _, sz in info["sample_ranges"]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MP4_METADATA_SCHEMA.fields]
            )

    return (
        media.filter(F.col("mime") == "video/mp4")
        .select("media_id", "payload")
        .mapInPandas(run, MP4_METADATA_SCHEMA)
    )
