"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, with decode / feature-extract / frame-sample
as Arrow-batched pandas UDFs over mapInPandas.

The decode step is STUBBED (this container ships no image/audio codecs
— see decode_media) behind a deterministic fake so the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) is real and
tested; swap `_decode_bytes` for a PIL/torchaudio call in production.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id string, span_idx int, kind string, media_ref string, payload binary"
)
FEATURE_DIM = 32


def fetch_media(spans: DataFrame) -> DataFrame:
    """Media spans -> (doc_id, span_idx, kind, media_ref, payload).

    payload is a deterministic synthetic blob derived from media_ref (in
    production this is the object-store fetch — an IO-bound mapInPandas
    with per-batch connection reuse)."""
    media = spans.where(F.col("kind") != "text").select(
        "doc_id", "span_idx", "kind", "media_ref"
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                hashlib.sha256(str(r).encode()).digest() * 8 for r in pdf["media_ref"]
            ]
            yield pdf

    return media.mapInPandas(fetch, MEDIA_SCHEMA)


def _decode_bytes(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: no codec libraries in this container.

    Production: PIL.Image.open / torchaudio.load / pyav frame sampling.
    Here: a deterministic pseudo-decode (seeded by payload hash) that
    yields the right shapes so downstream feature extraction is real.
    """
    seed = zlib.crc32(payload[:64])
    rng = np.random.RandomState(seed)
    if kind == "image":
        return rng.rand(16, 16, 3)  # HWC float "pixels"
    if kind == "audio":
        return rng.rand(1024)  # mono samples
    if kind == "video":
        return rng.rand(4, 16, 16, 3)  # THWC frame sample
    raise NotImplementedError(f"no decoder for kind={kind!r}")


def extract_media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(doc_id, span_idx, kind, feat: array<double>) — batched numpy
    feature extraction over the decoded payloads (mean-pooled blocks)."""
    schema = "doc_id string, span_idx int, kind string, feat array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = _decode_bytes(bytes(payload), kind).ravel()
                # mean-pool into `dim` buckets (cheap, shape-agnostic)
                pad = (-len(arr)) % dim
                pooled = np.pad(arr, (0, pad)).reshape(dim, -1).mean(axis=1)
                feats.append(pooled.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "kind": pdf["kind"],
                    "feat": feats,
                }
            )

    return media.mapInPandas(run, schema)
