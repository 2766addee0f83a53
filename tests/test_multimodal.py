"""Multimodal plumbing: schema, mapInPandas batch shape, stubbed decode,
resize stage, frame sampling — the Spark-side dataflow is fully real."""

import pytest

from sqlstreamstore_spark.analytics import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.make_fake_media_df(spark, 60).repartition(4).cache()
    df.count()
    return df


def test_decode_features_roundtrip(media):
    feats = {r["media_id"]: r for r in mm.decode_features(media).collect()}
    assert len(feats) == 60
    for r in media.collect():
        f = feats[r["media_id"]]
        assert f["decoded_kind"] == r["kind"]
        if r["kind"] == "image":
            assert (f["width"], f["height"]) == (r["meta"]["width"], r["meta"]["height"])
        assert f["n_bytes"] == len(r["payload"])


def test_decode_is_deterministic(media):
    a = sorted(map(tuple, mm.decode_features(media).collect()))
    b = sorted(map(tuple, mm.decode_features(media).collect()))
    assert a == b


def test_resize_rewrites_dims(media):
    out = mm.resize_images(media, 32, 32)
    rows = out.collect()
    assert rows and all((r["width"], r["height"]) == (32, 32) for r in rows)
    # only image rows pass through
    assert len(rows) == media.filter("kind = 'image'").count()
    redecoded = [mm._decode_one(bytes(r["payload"])) for r in rows]
    assert all((d["width"], d["height"]) == (32, 32) for d in redecoded)


def test_frame_sampling_counts(media):
    frames = mm.sample_video_frames(media, every_ms=500)
    counts = {r["media_id"]: r["n"] for r in
              frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    for r in media.filter("kind = 'video'").collect():
        expected = (r["meta"]["duration_ms"] - 1) // 500 + 1
        assert counts[r["media_id"]] == expected


def test_codec_formats_raise_not_implemented(spark):
    # unknown containers need an external codec — the honest stub
    # boundary (JPEG and the MP4 container walk decode for real now)
    with pytest.raises(NotImplementedError):
        mm._decode_one(b"\x1a\x45\xdf\xa3" + bytes(40))  # Matroska magic
    # MP4 magic with a broken container is a parse ERROR, not a stub
    with pytest.raises(ValueError):
        mm._decode_one(b"\x00\x00\x00\x18ftypmp42" + bytes(32))


def test_real_jpeg_roundtrip_and_decode():
    """REAL baseline JPEG: own encoder→decoder round-trips within
    quantization error across 4:4:4 / 4:2:0 / grayscale / restart
    markers, and _decode_one reports true dimensions + a checksum over
    decoded pixels. Progressive JPEG raises honestly."""
    import numpy as np

    from sqlstreamstore_spark.analytics.jpeg import jpeg_decode, jpeg_encode

    img = mm._synth_image(5, 40, 24)
    for sub, ri in [("444", 0), ("420", 0), ("444", 2), ("420", 3)]:
        enc = jpeg_encode(img, quality=90, subsampling=sub, restart_interval=ri)
        dec = jpeg_decode(enc)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        # the synth gradient wraps 255→0, creating chroma edges 4:2:0
        # genuinely can't represent — hence the looser subsampled bound
        assert err < (4.0 if sub == "444" else 10.0), (sub, ri, err)
    gray = img[:, :, 0]
    assert jpeg_decode(jpeg_encode(gray, 90)).shape == gray.shape
    # odd (non-8-multiple) dims survive pad+crop
    odd = mm._synth_image(9, 23, 17)
    assert jpeg_decode(jpeg_encode(odd, 90, "420")).shape == odd.shape
    # _decode_one integration
    enc = jpeg_encode(img, 85)
    d = mm._decode_one(enc)
    assert (d["decoded_kind"], d["width"], d["height"]) == ("image", 40, 24)
    assert d["checksum"] == int(jpeg_decode(enc).sum()) % 65536
    # progressive (SOF2) is out of scope and must say so
    sof2 = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        jpeg_decode(sof2)


def test_real_mjpeg_avi_decode_and_frame_extraction(spark):
    """REAL video: MJPEG-AVI container round-trips (own writer/reader),
    _decode_one reports true dims/duration with a checksum over ALL
    decoded frames, and extract_video_frames (mapInPandas) decodes only
    the sampled frames with correct timestamps."""
    import numpy as np

    from sqlstreamstore_spark.analytics.avi import (
        avi_decode_frame,
        avi_encode,
        avi_frame_jpegs,
        avi_info,
    )

    frames = [mm._synth_image(i, 32, 24) for i in range(6)]
    avi = avi_encode(frames, fps=4)  # 1500 ms
    info = avi_info(avi)
    assert (info["width"], info["height"], info["n_frames"]) == (32, 24, 6)
    assert info["duration_ms"] == 1500
    assert len(avi_frame_jpegs(avi)) == 6
    dec2 = avi_decode_frame(avi, 2)
    assert dec2.shape == (24, 32, 3)
    assert np.abs(dec2.astype(int) - frames[2].astype(int)).mean() < 4.0

    d = mm._decode_one(avi)
    assert (d["decoded_kind"], d["width"], d["height"], d["duration_ms"]) == (
        "video", 32, 24, 1500)

    rows = [(0, "video", "video/x-msvideo", avi, (None, None, 1500, "mjpeg"))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.frame_ts_ms: r for r in mm.extract_video_frames(media, 500).collect()}
    assert sorted(got) == [0, 500, 1000]
    # ts→frame mapping at 4 fps (250 ms/frame): 0→0, 500→2, 1000→4
    assert [got[t].frame_index for t in (0, 500, 1000)] == [0, 2, 4]
    for t in (0, 500, 1000):
        img = avi_decode_frame(avi, got[t].frame_index)
        assert got[t].checksum == int(img.sum()) % 65536
        assert (got[t].width, got[t].height) == (32, 24)


def test_audio_features_pure_tone(spark):
    """DSP sanity on a constructed signal: a pure 1 kHz sine at 8 kHz
    must report dominant frequency 1000 Hz, RMS ≈ amplitude/√2, ZCR ≈
    2·f/rate; the Spark operator (mapInPandas) returns the same row the
    driver-side twin computes."""
    import io
    import wave

    import numpy as np

    rate, f0, amp, n = 8000, 1000, 0.5, 8000
    t = np.arange(n)
    pcm = (np.sin(2 * np.pi * f0 * t / rate) * amp * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    wav = buf.getvalue()

    d = mm._audio_features_one(7, wav)
    assert d["duration_ms"] == 1000 and d["sample_rate"] == rate
    assert abs(d["dominant_freq_hz"] - f0) < 1.0
    assert abs(d["rms"] - amp / np.sqrt(2)) < 0.01
    assert abs(d["zero_crossing_rate"] - 2 * f0 / rate) < 0.01

    rows = [(7, "audio", "audio/wav", wav, (None, None, 1000, "pcm_s16le"))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = mm.audio_features(media).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.media_id, r.duration_ms, r.n_samples) == (7, 1000, n)
    assert r.rms == d["rms"] and r.dominant_freq_hz == d["dominant_freq_hz"]


def test_real_jpeg_resize_through_spark(spark):
    """JPEG rows flow through resize_images (mapInPandas) and come back
    as decodable JPEGs of the target size."""
    from sqlstreamstore_spark.analytics.jpeg import jpeg_decode, jpeg_encode

    img = mm._synth_image(7, 32, 16)
    rows = [(0, "image", "image/jpeg", jpeg_encode(img, 90), (32, 16, None, "jpeg"))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.resize_images(media, 8, 8).collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (8, 8)
    assert jpeg_decode(bytes(out[0].payload)).shape == (8, 8, 3)


def _make_png(w, h, ch=3):
    import numpy as np

    img = (np.arange(h * w * ch, dtype=np.uint32) * 37 % 256).astype(np.uint8)
    return img.reshape(h, w, ch), mm._png_encode(img.reshape(h, w, ch))


def test_real_png_roundtrip_and_decode():
    """REAL PNG decode: encoder->decoder round-trips pixels exactly, and
    _decode_one reports true dimensions + a checksum over decoded
    pixels. Also covers filtered input: a filter-2 (Up) scanline stream
    de-filters correctly."""
    import struct
    import zlib

    import numpy as np

    img, png = _make_png(5, 4)
    assert (mm._png_pixels(png) == img).all()
    d = mm._decode_one(png)
    assert (d["decoded_kind"], d["width"], d["height"]) == ("image", 5, 4)
    assert d["checksum"] == int(img.sum()) % 65536
    # hand-build a PNG whose rows use filter type 2 (Up)
    h, w, ch = img.shape
    rows = [img[0].tobytes()]
    for r in range(1, h):
        rows.append((img[r] - img[r - 1]).tobytes())  # uint8 wraps
    raw = b"\x00" + rows[0] + b"".join(b"\x02" + rb for rb in rows[1:])

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png2 = (mm._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (mm._png_pixels(png2) == img).all()
    # corrupt CRC must be detected, not silently decoded
    bad = bytearray(png)
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError):
        mm._png_pixels(bytes(bad))


def test_real_bmp_wav_decode_and_resize_through_spark(spark):
    """Real formats through the actual Spark operators: a BMP and a PNG
    decode to true dims via decode_features (mapInPandas), a WAV reports
    its real duration, and resize_images produces a decodable image of
    the target size whose pixels equal the nearest-neighbor resample."""
    import io
    import wave

    import numpy as np

    bmp_img = (np.arange(6 * 4 * 3, dtype=np.uint32) * 11 % 256).astype(
        np.uint8
    ).reshape(4, 6, 3)
    bmp = mm._bmp_encode(bmp_img)
    assert (mm._bmp_pixels(bmp) == bmp_img).all()
    png_img, png = _make_png(6, 4)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(bytes(1600))  # 800 frames @ 8 kHz = 100 ms
    wav = buf.getvalue()

    rows = [
        (0, "image", "image/bmp", bmp, (6, 4, None, "bmp")),
        (1, "image", "image/png", png, (6, 4, None, "png")),
        (2, "audio", "audio/wav", wav, (None, None, 100, "pcm_s16le")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in mm.decode_features(media).collect()}
    assert (feats[0].width, feats[0].height, feats[0].decoded_kind) == (6, 4, "image")
    assert (feats[1].width, feats[1].height) == (6, 4)
    assert (feats[2].decoded_kind, feats[2].duration_ms) == ("audio", 100)

    out = {r.media_id: r for r in mm.resize_images(media, 3, 2).collect()}
    assert set(out) == {0, 1}
    want_bmp = mm._nearest_resize(bmp_img, 3, 2)
    want_png = mm._nearest_resize(png_img, 3, 2)
    assert (mm._bmp_pixels(bytes(out[0].payload)) == want_bmp).all()
    assert (mm._png_pixels(bytes(out[1].payload)) == want_png).all()


def test_payload_stats_matches_python_hash(spark):
    """The oracled mapInPandas path: byte length + md5 from the Arrow
    batches equals driver-side hashlib over the same text."""
    import hashlib

    from sqlstreamstore_spark.analytics.multimodal import (
        documents_as_media,
        payload_stats,
    )
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    expected = {
        r["doc_id"]: (len(r["text"].encode()), hashlib.md5(r["text"].encode()).hexdigest())
        for r in docs.collect()
    }
    got = payload_stats(documents_as_media(docs)).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (r["n_bytes"], r["digest"]) == expected[r["media_id"]]


def test_frame_sample_tolerates_zero_duration(spark):
    """A zero-length video yields no frames instead of an ANSI illegal
    sequence boundary error."""
    from sqlstreamstore_spark.analytics.multimodal import (
        MEDIA_SCHEMA,
        encode_fake_media,
        sample_video_frames,
    )

    rows = [
        (1, "video", "video/mp4", encode_fake_media(1, "video", 0, 0, 0),
         (None, None, 0, "fake")),
        (2, "video", "video/mp4", encode_fake_media(2, "video", 0, 0, 2500),
         (None, None, 2500, "fake")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_video_frames(media, every_ms=1000).collect()
    assert sorted((r.media_id, r.frame_ts_ms) for r in got) == [
        (2, 0), (2, 1000), (2, 2000)]


def test_png_defilter_all_filter_types():
    """Every PNG scanline filter (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth) de-filters back to the same pixels: encode each row of a
    known image with a different filter and decode."""
    import struct
    import zlib

    import numpy as np

    img, _ = _make_png(4, 5)  # 5 rows -> one per filter type
    h, w, ch = img.shape
    stride = w * ch

    def paeth(a, b, c):
        pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    out = b""
    for r in range(h):
        f = r % 5
        cur = img[r].reshape(stride).astype(int)
        prev = img[r - 1].reshape(stride).astype(int) if r else np.zeros(stride, int)
        line = bytearray(stride)
        for i in range(stride):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[f]
            line[i] = (int(cur[i]) - pred) & 0xFF
        out += bytes([f]) + bytes(line)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (mm._PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(out)) + chunk(b"IEND", b""))
    assert (mm._png_pixels(png) == img).all()


def test_real_gif_roundtrip_and_decode(spark):
    """REAL GIF: LZW encoder→decoder round-trips the palette image
    exactly (incl. interlace + transparency decode paths), and the
    Spark decode/resize operators handle GIF rows."""
    import numpy as np

    from sqlstreamstore_spark.analytics.gif import gif_decode, gif_encode

    img = (mm._synth_image(11, 30, 20) // 64) * 64
    g = gif_encode(img)
    d = gif_decode(g)
    assert d.shape == (20, 30, 4)
    assert (d[:, :, :3] == img).all() and (d[:, :, 3] == 255).all()

    f = mm._decode_one(g)
    assert (f["decoded_kind"], f["width"], f["height"]) == ("image", 30, 20)
    assert f["checksum"] == int(d.sum()) % 65536

    rows = [(0, "image", "image/gif", g, (30, 20, None, "gif"))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.resize_images(media, 15, 10).collect()
    assert len(out) == 1
    resized = gif_decode(bytes(out[0].payload))
    want = mm._nearest_resize(img, 15, 10)
    assert (resized[:, :, :3] == want).all()

    # interlaced + transparent variant, hand-built: reuse encoder output
    # but set the interlace flag path via _deinterlace identity check
    from sqlstreamstore_spark.analytics.gif import _deinterlace

    idx = np.arange(7 * 3).reshape(7, 3) % 4
    order = [0] + [4] + [2, 6] + [1, 3, 5]
    shuffled = idx[order]
    assert (_deinterlace(shuffled) == idx).all()


def test_image_perceptual_hash_dedup(spark):
    """aHash is codec-invariant: the same picture encoded as PNG, JPEG
    and BMP lands within Hamming ≤ 3 (the banding-guaranteed radius),
    so image_near_dup_pairs finds all three pairs via the band join —
    while a genuinely different image pairs with none of them."""
    from sqlstreamstore_spark.analytics.jpeg import jpeg_encode

    img = mm._synth_image(42, 64, 48)
    other = mm._synth_image(7, 64, 48)[::-1, ::-1]  # different content
    rows = [
        (0, "image", "image/png", mm._png_encode(img), (64, 48, None, "png")),
        (1, "image", "image/jpeg", jpeg_encode(img, 85), (64, 48, None, "jpeg")),
        (2, "image", "image/bmp", mm._bmp_encode(img), (64, 48, None, "bmp")),
        (3, "image", "image/png", mm._png_encode(other), (64, 48, None, "png")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    hashes = {r.media_id: r.ahash for r in mm.image_ahash(media).collect()}
    assert len(hashes) == 4
    # driver twin agrees with the distributed path
    assert hashes[0] == mm._ahash_one(rows[0][3])
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in mm.image_near_dup_pairs(media, max_hamming=3).collect()}
    assert set(pairs) == {(0, 1), (0, 2), (1, 2)}
    assert all(h <= 3 for h in pairs.values())
    # exact-format duplicates have identical hashes → hamming 0
    assert pairs[(0, 2)] == 0  # PNG and BMP decode to identical pixels


def test_video_near_dup_detects_shared_frames(spark):
    """Two MJPEG videos sharing >=2 frames pair up; an unrelated video
    pairs with nothing (banded frame match, exact Hamming verify)."""
    from sqlstreamstore_spark.analytics.avi import avi_encode

    f = [mm._synth_image(i, 32, 24) for i in range(8)]
    v0 = avi_encode([f[0], f[1], f[2], f[3]], fps=2)       # 2000 ms
    v1 = avi_encode([f[2], f[3], f[4], f[5]], fps=2)       # shares f2,f3
    v2 = avi_encode([f[6], f[7], f[6], f[7]], fps=2)       # unrelated
    rows = [
        (0, "video", "video/x-msvideo", v0, (None, None, 2000, "mjpeg")),
        (1, "video", "video/x-msvideo", v1, (None, None, 2000, "mjpeg")),
        (2, "video", "video/x-msvideo", v2, (None, None, 2000, "mjpeg")),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {(r.id_a, r.id_b): (r.n_shared_frames, r.min_hamming)
           for r in mm.video_near_dup_pairs(media, every_ms=500, max_hamming=3,
                                            min_shared_frames=2).collect()}
    assert (0, 1) in got
    assert got[(0, 1)][1] == 0  # identical frames -> hamming 0
    assert all(2 not in k for k in got), got


def test_mp4_container_roundtrip():
    """The ISO-BMFF writer's container facts parse back exactly:
    duration from mvhd, dims from tkhd, fourcc from stsd, count from
    stsz, timing from stts, and every sample range locates the exact
    bytes written."""
    from sqlstreamstore_spark.analytics.mp4 import (
        fake_sample_bytes,
        mp4_encode,
        mp4_probe,
        mp4_sample,
    )

    p = mp4_encode(9, 320, 240, 7, fps=4)
    info = mp4_probe(p)
    assert (info["brand"], info["codec"]) == ("isom", "avc1")
    assert (info["width"], info["height"]) == (320, 240)
    assert info["n_frames"] == 7
    assert info["duration_ms"] == 7 * 250
    assert info["frame_times_ms"] == [0, 250, 500, 750, 1000, 1250, 1500]
    for i in range(7):
        assert mp4_sample(p, info, i) == fake_sample_bytes(9, i)


def test_mp4_probe_rejects_corrupt_tables():
    """The parser validates, not just reads: a sample range running
    past EOF and a box overrunning its container both raise."""
    import struct

    import pytest as _pytest

    from sqlstreamstore_spark.analytics.mp4 import mp4_encode, mp4_probe

    p = mp4_encode(1, 16, 16, 3)
    # corrupt stco: point the chunk at the end of the file
    i = p.find(b"stco")
    bad = bytearray(p)
    struct.pack_into(">I", bad, i + 12, len(p) - 4)
    with _pytest.raises(ValueError, match="overruns the file"):
        mp4_probe(bytes(bad))
    # truncated file: moov cut off
    with _pytest.raises(ValueError):
        mp4_probe(p[: len(p) // 2])


def test_mp4_multi_chunk_stsc_general_walk():
    """The stsc→chunk→offset algorithm is the general one: hand-build a
    two-chunk layout (2 samples in chunk 1, 1 in chunk 2) and check all
    three samples locate correctly."""
    import struct

    from sqlstreamstore_spark.analytics import mp4 as M

    s0, s1, s2 = b"AAAA", b"BBBBBB", b"CC"
    ftyp = M._box(b"ftyp", b"isom", struct.pack(">I", 512), b"isom")
    gap = M._box(b"free", b"\x00" * 4)  # chunks need not be adjacent
    mdat = M._box(b"mdat", s0 + s1 + b"XX" + s2)  # XX = unreferenced junk
    c1 = len(ftyp) + len(gap) + 8
    c2 = c1 + len(s0) + len(s1) + 2
    stsd = M._full(b"stsd", 0, 0, struct.pack(">I", 1),
                   M._box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70))
    stts = M._full(b"stts", 0, 0, struct.pack(">I", 1), struct.pack(">II", 3, 100))
    stsc = M._full(b"stsc", 0, 0, struct.pack(">I", 2),
                   struct.pack(">III", 1, 2, 1), struct.pack(">III", 2, 1, 1))
    stsz = M._full(b"stsz", 0, 0, struct.pack(">II", 0, 3),
                   struct.pack(">III", 4, 6, 2))
    stco = M._full(b"stco", 0, 0, struct.pack(">I", 2), struct.pack(">II", c1, c2))
    stbl = M._box(b"stbl", stsd, stts, stsc, stsz, stco)
    minf = M._box(b"minf", M._full(b"vmhd", 0, 1, struct.pack(">Hhhh", 0, 0, 0, 0)), stbl)
    mdhd = M._full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 300),
                   struct.pack(">Hh", 0x55C4, 0))
    mdia = M._box(b"mdia", mdhd, M._full(b"hdlr", 0, 0, struct.pack(">I", 0),
                                         b"vide", b"\x00" * 12, b"x\x00"), minf)
    tkhd = M._full(b"tkhd", 0, 3, struct.pack(">IIIII", 0, 0, 1, 0, 300),
                   b"\x00" * 8, struct.pack(">hhhh", 0, 0, 0, 0),
                   M._UNITY_MATRIX, struct.pack(">II", 8 << 16, 8 << 16))
    trak = M._box(b"trak", tkhd, mdia)
    mvhd = M._full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 300),
                   struct.pack(">i", 0x00010000), struct.pack(">h", 0x0100),
                   b"\x00" * 10, M._UNITY_MATRIX, b"\x00" * 24, struct.pack(">I", 2))
    p = ftyp + gap + mdat + M._box(b"moov", mvhd, trak)
    info = M.mp4_probe(p)
    assert info["codec"] == "mp4v" and info["n_frames"] == 3
    assert [M.mp4_sample(p, info, i) for i in range(3)] == [s0, s1, s2]


def test_mp4_metadata_operator(spark):
    """Distributed probe == driver-side probe for every MP4 row in the
    synthetic media table; non-MP4 rows are filtered out by mime."""
    from sqlstreamstore_spark.analytics.mp4 import mp4_probe
    from sqlstreamstore_spark.analytics.multimodal import (
        make_fake_media_df,
        make_media_payload,
        mp4_container_metadata,
    )

    got = {r.media_id: r for r in mp4_container_metadata(make_fake_media_df(spark, 30)).collect()}
    expect = {}
    for i in range(30):
        if i % 3 == 2 and (i // 3) % 2 == 1:
            w, h, d = (64 + i % 32, 48 + i % 24, 1000 + i * 10)
            payload, mime, codec = make_media_payload(i, "video", w, h, d)
            assert (mime, codec) == ("video/mp4", "avc1")
            expect[i] = mp4_probe(payload)
    assert set(got) == set(expect) and got
    for i, info in expect.items():
        r = got[i]
        assert (r.brand, r.codec, r.width, r.height, r.duration_ms, r.n_frames) == (
            info["brand"], info["codec"], info["width"], info["height"],
            info["duration_ms"], info["n_frames"])
        assert r.data_bytes == sum(sz for _, sz in info["sample_ranges"])
