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


def resize_media(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """(doc_id, span_idx, kind, pixels: array<double>) — decode +
    spatial resize to (out_h, out_w) by block-mean pooling, flattened
    HWC. Images resize directly; videos resize their first frame; audio
    is skipped (no spatial dims). Arrow-batched mapInPandas — the same
    plumbing a PIL/torchvision resize would ride."""
    schema = "doc_id string, span_idx int, kind string, pixels array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "kind", "pixels")}
            for doc_id, span_idx, kind, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["kind"], pdf["payload"]
            ):
                if kind == "audio":
                    continue
                arr = _decode_bytes(bytes(payload), kind)
                if kind == "video":
                    arr = arr[0]  # first frame
                h, w, c = arr.shape
                bh, bw = max(h // out_h, 1), max(w // out_w, 1)
                arr = arr[: bh * out_h, : bw * out_w]
                pooled = arr.reshape(out_h, bh, out_w, bw, c).mean(axis=(1, 3))
                out["doc_id"].append(doc_id)
                out["span_idx"].append(span_idx)
                out["kind"].append(kind)
                out["pixels"].append(pooled.ravel().tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema)


def sample_frames(media: DataFrame, n_frames: int = 2) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (doc_id, span_idx, frame_idx, frame: array<double> flattened HWC)
    — uniform stride over the decoded frame axis. Non-video rows are
    dropped (filter pushed before the decode)."""
    schema = "doc_id string, span_idx int, frame_idx int, frame array<double>"
    vids = media.where(F.col("kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "frame_idx", "frame")}
            for doc_id, span_idx, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["payload"]
            ):
                arr = _decode_bytes(bytes(payload), "video")
                t = arr.shape[0]
                idxs = np.linspace(0, t - 1, min(n_frames, t)).round().astype(int)
                for fi in idxs:
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(span_idx)
                    out["frame_idx"].append(int(fi))
                    out["frame"].append(arr[fi].ravel().tolist())
            yield pd.DataFrame(out)

    return vids.mapInPandas(run, schema)


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
