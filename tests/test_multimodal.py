"""Multimodal plumbing: binary columns through mapInPandas, format sniff,
exact payload dedup. Decode itself is a documented deterministic stub."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG\r\n" + b"x" * 100), "png"),
        (2, "image", bytearray(b"\xff\xd8\xff\xe0" + b"y" * 80), "jpeg"),
        (3, "audio", bytearray(b"RIFF" + b"z" * 50), "wav"),
        (4, "video", bytearray(b"\x1aE\xdf\xa3" + b"w" * 60), "webm"),
        (5, "image", bytearray(b"\x89PNG\r\n" + b"x" * 100), "png"),  # dup of 1
        (6, "image", bytearray(b"???" + b"q" * 10), "unknown"),
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, declared_format string")


def test_feature_extraction_schema_and_sniff(spark, media):
    from sparkdedup.operators.multimodal import extract_media_features

    feats = extract_media_features(media, dim=16).toPandas()
    assert len(feats) == 6
    by_id = feats.set_index("media_id")
    assert by_id.loc[1, "sniffed_format"] == "png"
    assert by_id.loc[2, "sniffed_format"] == "jpeg"
    assert by_id.loc[3, "sniffed_format"] == "riff/wav"
    assert by_id.loc[4, "sniffed_format"] == "webm"
    assert by_id.loc[6, "sniffed_format"] == "unknown"
    assert all(len(f) == 16 for f in feats["feature"])
    # deterministic features; identical payloads -> identical features
    assert list(by_id.loc[1, "feature"]) == list(by_id.loc[5, "feature"])


def test_exact_media_dedup(spark, media):
    from sparkdedup.operators.multimodal import (exact_media_dedup,
                                                 extract_media_features)

    feats = extract_media_features(media)
    groups = exact_media_dedup(feats).toPandas()
    assert len(groups) == 5  # 1 and 5 collapse
    dup = groups[groups.n_copies == 2]
    assert len(dup) == 1 and dup.iloc[0]["rep_media_id"] == 1
