"""MP4 container codec gates (functions/mp4_codec.py).

The writer exists to make the parser provable without external media
fixtures: metadata round trip, the chunk-layout INVARIANCE of the
sample-stream hash (the content-identity claim), and corruption safety.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from sparkdedup.functions.mp4_codec import encode_mp4, parse_mp4

SAMPLES = [bytes([i]) * (10 + 7 * i) for i in range(9)]


def test_metadata_round_trip():
    payload = encode_mp4(SAMPLES, timescale=600, sample_delta=20,
                         handler="vide", codec="avc1",
                         width=320, height=240)
    info = parse_mp4(payload)
    assert info.major_brand == "isom"
    assert info.timescale == 600
    assert info.duration == pytest.approx(9 * 20 / 600)
    (tr,) = info.tracks
    assert (tr.handler, tr.codec) == ("vide", "avc1")
    assert (tr.width, tr.height) == (320, 240)
    assert tr.n_samples == 9
    assert tr.sample_sizes.tolist() == [len(s) for s in SAMPLES]
    assert tr.sample_bytes == b"".join(SAMPLES)


def test_sample_hash_invariant_under_remux():
    """Same samples, different chunk layouts -> identical stream hash
    (the container-independent content identity used as decoded_md5)."""
    layouts = [[9], [3, 3, 3], [1] * 9, [4, 5], [2, 2, 2, 2, 1]]
    hashes = set()
    for chunks in layouts:
        info = parse_mp4(encode_mp4(SAMPLES, chunks=chunks))
        hashes.add(hashlib.md5(info.tracks[0].sample_bytes).hexdigest())
    assert len(hashes) == 1
    # and a DIFFERENT sample stream hashes differently
    other = parse_mp4(encode_mp4([b"x" * 10]))
    assert hashlib.md5(other.tracks[0].sample_bytes).hexdigest() \
        not in hashes


def test_uniform_sample_size_stsz_form():
    uniform = [b"abcd"] * 5
    info = parse_mp4(encode_mp4(uniform, handler="soun", codec="mp4a"))
    tr = info.tracks[0]
    assert tr.sample_sizes.tolist() == [4] * 5
    assert tr.sample_bytes == b"abcd" * 5
    assert tr.handler == "soun"


def test_empty_track():
    info = parse_mp4(encode_mp4([]))
    assert info.tracks[0].n_samples == 0
    assert info.tracks[0].sample_bytes == b""
    assert info.duration == 0.0


def test_corrupt_payloads_raise():
    good = encode_mp4(SAMPLES)
    with pytest.raises(ValueError):
        parse_mp4(good[:30])              # truncated mid-box
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 40)           # no ftyp
    bad = bytearray(good)
    bad[0:4] = (2 ** 31).to_bytes(4, "big")   # box overruns container
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))


def test_stsc_gap_rejected_deterministically():
    """r7 (ADVICE): a malformed stsc whose runs leave chunks uncovered
    must raise, never read uninitialized samples-per-chunk values."""
    good = encode_mp4(SAMPLES)
    idx = good.find(b"stsc")
    assert idx > 0
    bad = bytearray(good)
    # first_chunk of run 0: 1 -> 2 leaves chunk 1 with no covering run
    off = idx + 4 + 4 + 4  # tag + version/flags + entry_count
    assert bad[off:off + 4] == (1).to_bytes(4, "big")
    bad[off:off + 4] = (2).to_bytes(4, "big")
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))


def test_spark_extraction_path(spark):
    """Through extract_media_features: real codec/duration/dims and the
    sample-stream md5, with a corrupt row tagged not failed."""
    from sparkdedup.operators.multimodal import extract_media_features

    vid = encode_mp4(SAMPLES, timescale=1000, sample_delta=40,
                     handler="vide", codec="avc1", width=64, height=48)
    truncated = vid[:50]
    df = spark.createDataFrame(
        [(1, "video", bytearray(vid), "mp4"),
         (2, "video", bytearray(truncated), "mp4")],
        "media_id long, kind string, payload binary, declared_format string")
    rows = {r["media_id"]: r for r in
            extract_media_features(df).collect()}
    r1 = rows[1]
    assert r1["sniffed_format"] == "mp4"
    assert r1["codec"] == "avc1"
    assert (r1["width"], r1["height"]) == (64, 48)
    assert r1["n_samples"] == 9
    assert r1["duration"] == pytest.approx(9 * 40 / 1000)
    assert r1["decoded_md5"] == hashlib.md5(b"".join(SAMPLES)).hexdigest()
    assert rows[2]["codec"] == "corrupt"
