"""Stage 4 — graph materialization: resolve raw triples through the
entity map and emit the partitioned graph tables (nodes, edges,
provenance) per BASELINE.json north_rule.

The surface->entity joins are the hot-entity joins: a celebrity entity
can appear in 10^9 raw triples, so the entity map side goes through
salted_join (deterministic salt from doc_id) unless it is broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.skew import salted_join


def resolve_triples(
    raw_triples: DataFrame,
    entity_map: DataFrame,
    use_salting: bool = True,
    n_salt: int = 16,
) -> DataFrame:
    """raw (doc_id, span_idx, subj_surface, pred, obj_surface) +
    entity_map (surface, entity_id, canonical) ->
    (subj_id, subj, pred, obj_id, obj, doc_id, span_idx)."""
    subj_map = entity_map.select(
        F.col("surface").alias("subj_surface"),
        F.col("entity_id").alias("subj_id"),
        F.col("canonical").alias("subj"),
    )
    obj_map = entity_map.select(
        F.col("surface").alias("obj_surface"),
        F.col("entity_id").alias("obj_id"),
        F.col("canonical").alias("obj"),
    )
    if use_salting:
        t = salted_join(raw_triples, subj_map, "subj_surface", "doc_id", n_salt)
        t = salted_join(t, obj_map, "obj_surface", "doc_id", n_salt)
    else:
        t = raw_triples.join(subj_map, "subj_surface").join(obj_map, "obj_surface")
    return t.select("subj_id", "subj", "pred", "obj_id", "obj", "doc_id", "span_idx")


def build_nodes(entity_map: DataFrame, mentions: DataFrame) -> DataFrame:
    """entities table: (entity_id, canonical, n_surfaces, n_mentions)."""
    m = mentions.groupBy("surface").count()
    return (
        entity_map.join(m, "surface", "left")
        .fillna(0, ["count"])
        .groupBy("entity_id", "canonical")
        .agg(
            F.count(F.lit(1)).alias("n_surfaces"),
            F.sum("count").alias("n_mentions"),
        )
    )


def build_edges(triples: DataFrame) -> DataFrame:
    """Distinct canonical (subj_id, pred, obj_id) with support counts."""
    return triples.groupBy("subj_id", "subj", "pred", "obj_id", "obj").agg(
        F.count(F.lit(1)).alias("support")
    )


def build_provenance(triples: DataFrame) -> DataFrame:
    """One row per (triple, doc, span) — the lineage of every edge."""
    return triples.select("subj_id", "pred", "obj_id", "doc_id", "span_idx")
