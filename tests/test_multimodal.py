"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
encoder, explicit stubs for the real decoders."""

import pytest

from ner_extractor_spark.operators.multimodal import (MEDIA, decode_image,
                                                      extract_features,
                                                      fake_feature)


def test_extract_features_contract(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", 10, 10, None),
        (2, "audio", b"RIFF fake", "audio/wav", None, None, 1200),
        (3, "image", None, "image/png", 1, 1, None),
    ]
    media = spark.createDataFrame(rows, MEDIA)
    feats = extract_features(media).collect()
    by_id = {r["media_id"]: list(r["feature"]) for r in feats}
    assert len(by_id[1]) == 8
    assert by_id[1] == [pytest.approx(x) for x in fake_feature(b"\x89PNG fake bytes")]
    assert by_id[3] == [pytest.approx(x) for x in fake_feature(b"")]
    # deterministic across re-runs / partitioning
    feats2 = extract_features(media.repartition(3)).collect()
    assert {r["media_id"]: list(r["feature"]) for r in feats2} == \
        {k: [pytest.approx(x) for x in v] for k, v in by_id.items()}


def test_resize_images_dimension_algebra(spark):
    from ner_extractor_spark.operators.multimodal import resize_images
    rows = [
        (1, "image", b"a", "image/png", 640, 480, None),   # landscape
        (2, "image", b"b", "image/png", 30, 120, None),    # portrait
        (3, "image", b"c", "image/png", 16, 16, None),     # already small
        (4, "image", b"d", "image/png", None, None, None), # undecodable
        (5, "audio", b"e", "audio/wav", None, None, 900),  # wrong kind
    ]
    media = spark.createDataFrame(rows, MEDIA)
    out = {r["media_id"]: (r["out_width"], r["out_height"])
           for r in resize_images(media, max_side=64).collect()}
    assert out[1] == (64, 48)        # long side pinned, aspect kept
    assert out[2] == (16, 64)
    assert out[3] == (16, 16)        # never upscaled
    assert 4 not in out and 5 not in out
    # deterministic thumb bytes across partitioning
    a = {r["media_id"]: bytes(r["thumb"])
         for r in resize_images(media, max_side=64).collect()}
    b = {r["media_id"]: bytes(r["thumb"])
         for r in resize_images(media.repartition(4), max_side=64).collect()}
    assert a == b


def test_sample_frames_fanout(spark):
    from ner_extractor_spark.operators.multimodal import sample_frames
    rows = [
        (1, "video", b"v1", "video/mp4", None, None, 3500),
        (2, "video", b"v2", "video/mp4", None, None, 400),   # short: 1 frame
        (3, "image", b"i", "image/png", 8, 8, None),         # ignored
    ]
    media = spark.createDataFrame(rows, MEDIA)
    got = sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(
            (r["frame_idx"], r["frame_ts_ms"]))
    # every tick <= duration, t=0 included: 3500ms -> 0,1000,2000,3000
    assert sorted(by_id[1]) == [(0, 0), (1, 1000), (2, 2000), (3, 3000)]
    assert by_id[2] == [(0, 0)]
    assert 3 not in by_id


def test_real_decoders_are_explicit_stubs():
    with pytest.raises(NotImplementedError):
        decode_image(b"x")
