"""Graph contraction by a matching — the second half of multilevel
(Karypis-Kumar style) coarsening: given matched pairs from
matching.maximal_matching, collapse each pair into its min-id
representative and re-aggregate the surviving cross edges. Iterating
matching -> coarsen halves the similarity graph per level while
preserving its cluster structure, which is how a 10^12-node entity
graph becomes tractable for the spectral machinery (solve on the
coarse graph, interpolate back — the multilevel eigensolver recipe).

Semantics (deterministic): representative(x) = min(u, v) if x is in a
matched pair else x; contracted edge set = original edges with both
endpoints mapped, canonicalized least/greatest, self-edges (internal
to a pair) dropped, parallel edges aggregated by ``agg`` over the
weight column ("min" for distance weights — the closest cross-pair
distance survives, matching the closest-pair-first matching semantics
— "sum"/"max"/"count" for affinity/multiplicity semantics). All
per-group aggregates are order-independent, so the SQL twin is exact.

Scale design: one alias-sized map table (matched pairs only — never
node-sized), two broadcast-friendly left joins mapping the endpoints
(the sameas_canonicalize rewrite pattern, kg.py), one hash
aggregation. No windows, no iteration, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_AGGS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
}


def coarsen_graph(
    edges: DataFrame,
    matched: DataFrame,
    weight_col: str | None = None,
    agg: str = "min",
) -> DataFrame:
    """``edges`` (src, dst[, weight_col]) + ``matched`` (u, v) pairs ->
    contracted (u, v[, weight, n_merged]) edge list: endpoints mapped to
    their pair representative (min of the pair), self-edges dropped,
    parallel edges aggregated (``agg`` over the weight; n_merged = the
    multiplicity). Without ``weight_col`` only (u, v, n_merged)."""
    if weight_col is not None and agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    # alias map: both pair members -> the pair's min id; vertices not
    # in any pair are absent (coalesce keeps them as themselves)
    rep = matched.select(
        F.col("u").alias("node"), F.least("u", "v").alias("rep")
    ).union(
        matched.select(F.col("v").alias("node"), F.least("u", "v").alias("rep"))
    )
    mapped = (
        edges.join(
            rep.select(F.col("node").alias("src"), F.col("rep").alias("rs")),
            "src",
            "left",
        )
        .join(
            rep.select(F.col("node").alias("dst"), F.col("rep").alias("rd")),
            "dst",
            "left",
        )
        .select(
            F.coalesce("rs", "src").alias("a"),
            F.coalesce("rd", "dst").alias("b"),
            *([F.col(weight_col).alias("w")] if weight_col else []),
        )
        .select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
            *(["w"] if weight_col else []),
        )
        .where(F.col("u") != F.col("v"))
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_merged")]
    if weight_col:
        aggs.insert(0, _AGGS[agg]("w").alias("weight"))
    return mapped.groupBy("u", "v").agg(*aggs)
