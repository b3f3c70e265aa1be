"""Stage 1 — triple extraction from interleaved spans.

explode(spans) -> text spans -> vectorized mention detection (pandas
str ops over Arrow batches, no per-row Python) -> SVO triple candidates.

The extractor is dictionary-free: mentions are maximal Title-Case token
runs; the predicate is recognized from the fixed predicate-phrase
lexicon between two mentions. This mirrors the reference pipeline's
role split (mention detection feeds the embedding/linking stages that
simkit's similarity machinery implements).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..corpus import PREDICATES

MENTION_RE = re.compile(r"(?:[A-Z][a-z]+)(?: [A-Z][a-z]+)*")
# longest-first so "partnered with" wins over any prefix
_PHRASES = sorted(PREDICATES.items(), key=lambda kv: -len(kv[1]))

MENTIONS_SCHEMA = (
    "doc_id string, span_idx int, mention_id long, surface string, start int"
)
RAW_TRIPLES_SCHEMA = (
    "doc_id string, span_idx int, subj_surface string, pred string, obj_surface string"
)


def explode_spans(docs: DataFrame, carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """documents(doc_id, spans[]) -> one row per span, order preserved
    via posexplode (the span-sequence invariant's `order`).
    ``carry_cols``: extra doc-level columns to propagate onto every
    span row (e.g. the event-time column for streaming)."""
    return docs.select(
        "doc_id", *carry_cols, F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
        *carry_cols,
    )


def _stable_mention_id(doc_id: str, span_idx: int, start: int) -> int:
    import zlib

    h = zlib.crc32(f"{doc_id}|{span_idx}|{start}".encode())
    return ((h << 31) ^ zlib.crc32(f"{start}|{doc_id}".encode())) & 0x7FFFFFFFFFFFFFFF


def detect_mentions(spans: DataFrame, ts_col: str | None = None) -> DataFrame:
    """Text spans -> (doc_id, span_idx, mention_id, surface, start).

    mention_id is content-derived (hash of doc/span/char-start), never
    monotonically_increasing_id — stable under re-partitioning and
    checkpoint resume. ``ts_col`` names a timestamp column to carry
    through onto every mention (streaming event time).
    """
    cols = ["doc_id", "span_idx", "text"] + ([ts_col] if ts_col else [])
    text_spans = spans.where(F.col("kind") == "text").select(*cols)
    schema = MENTIONS_SCHEMA + (f", {ts_col} timestamp" if ts_col else "")

    def find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = ["doc_id", "span_idx", "mention_id", "surface", "start"] + (
                [ts_col] if ts_col else []
            )
            out = {k: [] for k in keys}
            ts_vals = pdf[ts_col] if ts_col else None
            for i, (doc_id, span_idx, text) in enumerate(
                zip(pdf["doc_id"], pdf["span_idx"], pdf["text"])
            ):
                if not text:
                    continue
                for m in MENTION_RE.finditer(text):
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(span_idx)
                    out["mention_id"].append(_stable_mention_id(doc_id, int(span_idx), m.start()))
                    out["surface"].append(m.group(0))
                    out["start"].append(m.start())
                    if ts_col:
                        out[ts_col].append(ts_vals.iloc[i])
            yield pd.DataFrame(out)

    return text_spans.mapInPandas(find, schema)


def extract_raw_triples(spans: DataFrame) -> DataFrame:
    """Text spans -> SVO candidates: exactly two mentions with a known
    predicate phrase between them."""
    text_spans = spans.where(F.col("kind") == "text").select("doc_id", "span_idx", "text")

    def svo(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "subj_surface", "pred", "obj_surface")}
            for doc_id, span_idx, text in zip(pdf["doc_id"], pdf["span_idx"], pdf["text"]):
                if not text:
                    continue
                ms = list(MENTION_RE.finditer(text))
                if len(ms) != 2:
                    continue
                between = text[ms[0].end(): ms[1].start()].strip().lower()
                for pred, phrase in _PHRASES:
                    if between == phrase:
                        out["doc_id"].append(doc_id)
                        out["span_idx"].append(int(span_idx))
                        out["subj_surface"].append(ms[0].group(0))
                        out["pred"].append(pred)
                        out["obj_surface"].append(ms[1].group(0))
                        break
            yield pd.DataFrame(out)

    return text_spans.mapInPandas(svo, RAW_TRIPLES_SCHEMA)
