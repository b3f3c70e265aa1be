"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, with decode / feature-extract / frame-sample
as Arrow-batched pandas UDFs over mapInPandas.

The decode step is REAL for the container formats that need no codec
library: 24-bit uncompressed BMP (raw BGR pixel rows) and PCM16 WAV
(RIFF) decode in pure numpy; video rides a trivial length-prefixed
concatenation of BMP frames (``VID0`` — a stand-in for a real
container, but every frame decode is a genuine BMP parse). fetch_media
synthesizes VALID payloads in those formats (in production it is the
object-store fetch), so the whole pipeline — fetch -> parse header ->
decode pixel/sample data -> feature extraction — exercises real bytes
end to end. Compressed formats (JPEG/MP3/H.264) would slot into
``_decode_bytes`` via PIL/torchaudio/pyav; none ship in this
container, which is why the synthetic corpus emits BMP/WAV.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id string, span_idx int, kind string, media_ref string, payload binary"
)
FEATURE_DIM = 32

# synthesized media shapes (decoded): image HWC, audio samples, video THWC
IMG_H, IMG_W = 16, 16
AUDIO_N = 1024
VIDEO_T = 4


# --------------------------------------------------------------- codecs
def encode_bmp(pixels: np.ndarray) -> bytes:
    """float HWC RGB in [0,1] -> 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    h, w, c = pixels.shape
    assert c == 3, "24-bit BMP wants 3 channels"
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    u8 = np.clip(np.round(pixels * 255.0), 0, 255).astype(np.uint8)
    bgr = u8[::-1, :, ::-1].reshape(h, row)  # bottom-up rows, BGR order
    if pad:
        bgr = np.concatenate([bgr, np.zeros((h, pad), np.uint8)], axis=1)
    return header + info + bgr.tobytes()


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> float HWC RGB in [0,1]."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    raw = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
    bgr = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].astype(np.float64) / 255.0


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """float mono samples in [-1,1] -> PCM16 RIFF/WAVE."""
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(b: bytes) -> np.ndarray:
    """PCM16 RIFF/WAVE (mono) -> float samples in [-1,1]."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    off = 12
    fmt_code = None
    while off + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, off)
        off += 8
        if cid == b"fmt ":
            fmt_code, channels = struct.unpack_from("<HH", b, off)
            if fmt_code != 1 or channels != 1:
                raise ValueError(f"unsupported WAV: fmt={fmt_code} ch={channels}")
        elif cid == b"data":
            pcm = np.frombuffer(b, "<i2", count=size // 2, offset=off)
            return pcm.astype(np.float64) / 32767.0
        off += size + (size % 2)  # chunks are word-aligned
    raise ValueError("WAV has no data chunk")


def encode_vid(frames: np.ndarray) -> bytes:
    """float THWC RGB -> 'VID0' + u32 count + length-prefixed BMP
    frames (a stand-in container; each frame is a real BMP)."""
    parts = [b"VID0", struct.pack("<I", frames.shape[0])]
    for f in frames:
        fb = encode_bmp(f)
        parts.append(struct.pack("<I", len(fb)))
        parts.append(fb)
    return b"".join(parts)


def decode_vid(b: bytes) -> np.ndarray:
    """'VID0' container -> float THWC RGB."""
    if b[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    (t,) = struct.unpack_from("<I", b, 4)
    off = 8
    frames = []
    for _ in range(t):
        (ln,) = struct.unpack_from("<I", b, off)
        off += 4
        frames.append(decode_bmp(b[off : off + ln]))
        off += ln
    return np.stack(frames)


def _synthesize_payload(media_ref: str, kind: str) -> bytes:
    """Deterministic valid payload for a media_ref (the synthetic stand-
    in for the object-store fetch): seeded pixels/samples, really
    encoded in the container format the decoder parses."""
    rng = np.random.RandomState(zlib.crc32(f"{kind}:{media_ref}".encode()))
    if kind == "image":
        return encode_bmp(rng.rand(IMG_H, IMG_W, 3))
    if kind == "audio":
        return encode_wav(rng.rand(AUDIO_N) * 2.0 - 1.0)
    if kind == "video":
        return encode_vid(rng.rand(VIDEO_T, IMG_H, IMG_W, 3))
    raise NotImplementedError(f"no synthesizer for kind={kind!r}")


def fetch_media(spans: DataFrame) -> DataFrame:
    """Media spans -> (doc_id, span_idx, kind, media_ref, payload).

    payload is a deterministic, VALID BMP/WAV/VID0 blob derived from
    media_ref (in production this is the object-store fetch — an
    IO-bound mapInPandas with per-batch connection reuse)."""
    media = spans.where(F.col("kind") != "text").select(
        "doc_id", "span_idx", "kind", "media_ref"
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _synthesize_payload(str(r), str(k))
                for r, k in zip(pdf["media_ref"], pdf["kind"])
            ]
            yield pdf

    return media.mapInPandas(fetch, MEDIA_SCHEMA)


def _decode_bytes(payload: bytes, kind: str) -> np.ndarray:
    """Real pure-numpy decode by container magic: BMP images -> HWC
    float RGB, PCM16 WAV -> float samples, VID0 -> THWC frames.
    Compressed formats would dispatch to PIL/torchaudio/pyav here."""
    if kind == "image":
        return decode_bmp(payload)
    if kind == "audio":
        return decode_wav(payload)
    if kind == "video":
        return decode_vid(payload)
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
