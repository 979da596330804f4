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


def test_real_decoders_are_explicit_stubs():
    with pytest.raises(NotImplementedError):
        decode_image(b"x")
