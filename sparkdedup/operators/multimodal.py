"""Multimodal columns: opaque binary payloads + typed metadata, decoded
and feature-extracted inside Arrow batches.

Decode is REAL for BMP / WAV / PNG (pure numpy + stdlib zlib —
sparkdedup/functions/media_codecs.py), baseline JPEG (pure numpy
Huffman+IDCT — functions/jpeg_codec.py) and the MP4 container
(functions/mp4_codec.py: full box-tree parse, metadata + the coded
sample stream): container parse -> pixel/sample array -> resize
(block-mean thumbnail) / frame-sample (framed energies). The ONLY
remaining stub is coded-frame entropy decode inside MP4 (H.264/AAC)
plus formats not listed above — those genuinely need external decoder
libraries this environment lacks and route to the documented
deterministic stub; swapping it for PIL/ffmpeg changes no Spark code.

Scale shape: payloads travel once through a mapInPandas pass (Arrow
binary transfer, no shuffle of payload bytes); everything after the
feature extraction is skinny columns.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.functions.media_codecs import (audio_features, decode_bmp,
                                               decode_png, decode_wav,
                                               image_features)

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, declared_format string"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sniffed_format string, "
    "content_hash string, codec string, width int, height int, "
    "sample_rate int, n_samples long, duration double, "
    "decoded_md5 string, feature array<float>"
)

_MAGIC = {
    b"\x89PNG": "png", b"\xff\xd8\xff": "jpeg", b"GIF8": "gif",
    b"BM": "bmp", b"RIFF": "riff/wav", b"ID3": "mp3", b"OggS": "ogg",
    b"\x1aE\xdf\xa3": "webm",
}


def sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    # ISO BMFF signature is positional, not a prefix: 4-byte box size
    # then 'ftyp' (the old prefix test b"\x00\x00\x00\x18" only matched
    # one specific ftyp length)
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def _decode_stub(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """STUB decoder for formats needing external libraries (JPEG/MP4/...):
    deterministic pseudo-features from payload bytes so the pipeline shape
    is exercised fully. Replace with PIL/ffmpeg in production."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def _decode_one(payload: bytes, kind: str, fmt: str, dim: int):
    """-> (codec, width, height, sample_rate, n_samples, duration,
    decoded_md5, feature[dim]).

    decoded_md5 hashes the RAW DECODED byte stream (pixel bytes in
    row-major RGB order / PCM16 little-endian sample bytes) — the
    container-independent content identity: the same pixels in a BMP and
    a PNG hash equal, and an encode->decode round trip reproduces the
    source bytes' md5 exactly (the driver-visible correctness gate)."""
    try:
        if fmt == "bmp":
            px = decode_bmp(payload)
            f = image_features(px)
            md5 = hashlib.md5(np.ascontiguousarray(px).tobytes()).hexdigest()
            return ("bmp", px.shape[1], px.shape[0], 0, 0, 0.0, md5, f)
        if fmt == "png":
            px = decode_png(payload)
            f = image_features(px)
            md5 = hashlib.md5(np.ascontiguousarray(px).tobytes()).hexdigest()
            return ("png", px.shape[1], px.shape[0], 0, 0, 0.0, md5, f)
        if fmt == "riff/wav":
            samples, rate = decode_wav(payload)
            f = audio_features(samples, rate)
            md5 = hashlib.md5(samples.astype("<i2").tobytes()).hexdigest()
            return ("wav", 0, 0, rate, len(samples),
                    len(samples) / rate if rate else 0.0, md5, f)
        if fmt == "jpeg":
            # real baseline-JPEG decode (pure numpy Huffman+IDCT,
            # functions/jpeg_codec.py) — the former documented stub.
            # decoded_md5 hashes the reconstructed pixels, which are
            # LOSSY vs the encoder's input — round-trip identity is
            # decode(encode(px)) == decode(encode(px)), not px.
            from sparkdedup.functions.jpeg_codec import decode_jpeg

            px = decode_jpeg(payload)
            f = image_features(px if px.ndim == 3
                               else np.repeat(px[..., None], 3, axis=2))
            md5 = hashlib.md5(np.ascontiguousarray(px).tobytes()).hexdigest()
            return ("jpeg", px.shape[1], px.shape[0], 0, 0, 0.0, md5, f)
        if fmt == "mp4":
            # real ISO BMFF container parse (functions/mp4_codec.py) —
            # the former documented stub. Every curation-relevant
            # metadatum is real (duration, codec fourcc, dimensions,
            # sample count) and decoded_md5 hashes the coded-sample
            # byte stream via the stco/stsc/stsz walk — a
            # container-layout-INVARIANT content identity (re-muxing
            # the same samples into different chunking hashes equal,
            # pytest-pinned). Only the coded-frame entropy decode
            # (H.264/AAC) still needs external libs; the per-sample
            # size sequence stands in as the deterministic feature.
            from sparkdedup.functions.mp4_codec import parse_mp4

            mp4 = parse_mp4(payload)
            tr = mp4.tracks[0] if mp4.tracks else None
            if tr is None:
                raise ValueError("mp4 without tracks")
            md5 = hashlib.md5(tr.sample_bytes).hexdigest()
            f = (tr.sample_sizes[:dim].astype(np.float32)
                 if len(tr.sample_sizes) else np.zeros(1, np.float32))
            return (tr.codec, tr.width, tr.height, tr.timescale,
                    tr.n_samples, mp4.duration, md5, f)
    except (ValueError, struct.error, zlib.error, IndexError, KeyError,
            NotImplementedError):
        # corrupt/truncated payload claiming a decodable magic: never fail
        # the batch — tag it and fall through to the deterministic stub
        return ("corrupt", 0, 0, 0, 0, 0.0, "",
                _decode_stub(payload, kind, dim))
    return ("stub", 0, 0, 0, 0, 0.0, "", _decode_stub(payload, kind, dim))


def _fit(vec: np.ndarray, dim: int) -> np.ndarray:
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(vec))] = vec[:dim]
    return out


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """binary payloads -> metadata + fixed-dim feature vectors (one
    mapInPandas pass; payload bytes never cross a shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [bytes(p) if p is not None else b""
                        for p in pdf["payload"]]
            fmts = [sniff_format(p) for p in payloads]
            decoded = [_decode_one(p, k, f, dim)
                       for p, k, f in zip(payloads, pdf["kind"], fmts)]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "n_bytes": [len(p) for p in payloads],
                "sniffed_format": fmts,
                "content_hash": [hashlib.sha256(p).hexdigest()
                                 for p in payloads],
                "codec": [d[0] for d in decoded],
                "width": np.array([d[1] for d in decoded], np.int32),
                "height": np.array([d[2] for d in decoded], np.int32),
                "sample_rate": np.array([d[3] for d in decoded], np.int32),
                "n_samples": np.array([d[4] for d in decoded], np.int64),
                "duration": np.array([d[5] for d in decoded], np.float64),
                "decoded_md5": [d[6] for d in decoded],
                "feature": [_fit(d[7], dim) for d in decoded],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def encode_media_from_text(docs: DataFrame, width: int = 16,
                           sample_rate: int = 16000) -> DataFrame:
    """Deterministic media table built in-Spark from document text bytes:
    per document one BMP row (utf-8 bytes as 24-bit pixels, fixed-width
    rows, 0x20-padded to a whole pixel grid), one WAV row (the bytes as
    PCM16 little-endian samples, 0x20-padded to a whole sample), and one
    MP4 row (the bytes chunked into 64-byte coded samples, 0x20-padded to
    a whole sample — uniform sizes keep the stsz box in its constant-size
    form, so container overhead is a CONSTANT 543 bytes for k>0 samples /
    519 for k=0 and n_bytes stays SQL arithmetic; decoded_md5 is the md5
    of the coded-sample stream the stco/stsc/stsz walk reconstructs,
    i.e. again exactly text || padding).

    Purpose: the sf dirs ship no media table, so this synthesizes one whose
    decode round trip is SQL-predictable — payload sizes and image/audio
    dims are pure arithmetic over octet_length(text), and the decoded byte
    stream is exactly text || padding, so decoded_md5 must equal
    md5(text || repeat(' ', pad)). One mapInPandas pass; payloads are born
    and consumed inside the scan lineage (never shuffled).

    width=16 keeps BMP rows 4-byte aligned (16*3 = 48 % 4 == 0): no BMP
    row padding, so the pixel stream is contiguous text bytes."""
    assert (width * 3) % 4 == 0, "width must keep BMP rows 4-byte aligned"
    from sparkdedup.functions.media_codecs import encode_bmp, encode_wav
    from sparkdedup.functions.mp4_codec import encode_mp4

    row_bytes = width * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, kinds, payloads, fmts = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")
                n = len(raw)
                h = max(1, -(-n // row_bytes))
                px = np.frombuffer(raw.ljust(h * row_bytes, b" "),
                                   np.uint8).reshape(h, width, 3)
                ids.append(doc_id)
                kinds.append("image")
                payloads.append(encode_bmp(px))
                fmts.append("bmp")
                ns = (n + 1) // 2
                smp = np.frombuffer(raw.ljust(ns * 2, b" "), "<i2")
                ids.append(doc_id)
                kinds.append("audio")
                payloads.append(encode_wav(smp, sample_rate))
                fmts.append("wav")
                k = -(-n // 64)
                padded = raw.ljust(k * 64, b" ")
                ids.append(doc_id)
                kinds.append("video")
                payloads.append(encode_mp4(
                    [padded[i * 64: (i + 1) * 64] for i in range(k)],
                    timescale=1000, sample_delta=40,
                    handler="vide", codec="raw ", width=0, height=0))
                fmts.append("mp4")
            yield pd.DataFrame({"media_id": ids, "kind": kinds,
                                "payload": payloads,
                                "declared_format": fmts})

    return (docs.select("doc_id", "text")
            .mapInPandas(run, schema=MEDIA_SCHEMA))


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Exact payload dedup on content hash (same shape as text exact dedup)."""
    return (features.groupBy("content_hash")
            .agg(F.min("media_id").alias("rep_media_id"),
                 F.count("*").alias("n_copies")))
