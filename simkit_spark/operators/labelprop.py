"""Synchronous label-propagation community detection over an edge list
— the lightweight community probe for the constructed KG (complements
spectral clustering: no eigensolve, one shuffle per sweep, labels are
node ids so the result is integer-exact across engines).

Update rule (deterministic): label_{t+1}(v) = the most frequent label
among v's neighbors at step t, ties broken by the SMALLEST label;
isolated nodes keep their label. Fixed ``n_iter`` sweeps (synchronous
LPA can oscillate; a fixed sweep count makes the output well-defined
and lets a SQL oracle reproduce it exactly — all-integer arithmetic,
no rounding contract needed).

Scale: per sweep = one join of the (node-sized) label table into a
fixed edge partitioning + two hash aggregations; the tie-break pick is
min(struct(-count, label)) — an aggregation with map-side partials,
NOT a per-node window sort. Lineage broken every few sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import materialize


def label_propagation(
    edges: DataFrame, n_iter: int = 5, checkpoint_every: int = 1
) -> DataFrame:
    """(src, dst) in any orientation -> (id, community) after
    ``n_iter`` synchronous sweeps. Self-loops dropped; duplicate edges
    de-duplicated (each neighbor votes once)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .union(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .repartition("b")
        .persist()
    )
    nodes = e.select(F.col("a").alias("id")).distinct().persist()
    labels = nodes.select("id", F.col("id").alias("label"))
    for i in range(n_iter):
        nb = e.join(
            labels.select(F.col("id").alias("b"), F.col("label")), "b"
        ).select(F.col("a"), F.col("label"))
        pick = (
            nb.groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("a")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("label").alias("lb"))).alias("m"))
            .select(F.col("a").alias("id"), F.col("m.lb").alias("new_label"))
        )
        labels = (
            labels.join(pick, "id", "left")
            .select("id", F.coalesce("new_label", "label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            labels = materialize(labels)
    out = materialize(labels.select("id", F.col("label").alias("community")))
    e.unpersist()
    nodes.unpersist()
    return out
