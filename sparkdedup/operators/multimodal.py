"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not in this container, so the decode
kernels are deterministic fakes behind `_decode_stub` (clearly marked); the
Spark-side plumbing — binary columns, schema, mapInPandas batch shape,
partitioning — is real and tested. Swapping `_decode_stub` for a real
decoder (PIL/librosa/ffmpeg) changes no Spark code.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, declared_format string"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sniffed_format string, "
    "content_hash string, feature array<float>"
)

_MAGIC = {
    b"\x89PNG": "png", b"\xff\xd8\xff": "jpeg", b"GIF8": "gif",
    b"RIFF": "riff/wav", b"ID3": "mp3", b"OggS": "ogg",
    b"\x00\x00\x00\x18": "mp4", b"\x1aE\xdf\xa3": "webm",
}


def sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def _decode_stub(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from payload bytes.

    Stands in for decode->resize->embed (image) / decode->frame-sample
    (video) / decode->spectrogram (audio). Replace with a real decoder in
    production; raises nothing so the pipeline shape is exercised fully.
    """
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """binary payloads -> metadata + feature vectors (one mapInPandas pass,
    Arrow binary transfer; payload never crosses a shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [bytes(p) if p is not None else b""
                        for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "n_bytes": [len(p) for p in payloads],
                "sniffed_format": [sniff_format(p) for p in payloads],
                "content_hash": [hashlib.sha256(p).hexdigest() for p in payloads],
                "feature": [_decode_stub(p, k, dim)
                            for p, k in zip(payloads, pdf["kind"])],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Exact payload dedup on content hash (same shape as text exact dedup)."""
    return (features.groupBy("content_hash")
            .agg(F.min("media_id").alias("rep_media_id"),
                 F.count("*").alias("n_copies")))
