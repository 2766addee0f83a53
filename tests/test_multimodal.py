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


def test_real_decode_raises_not_implemented(spark):
    import pandas as pd

    with pytest.raises(NotImplementedError):
        mm._decode_one(b"\x89PNG\r\n\x1a\nnotfake")


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
