"""The KG consumption layer (kg.py) over the DOCUMENT pipeline's own
triples: the (subj, pred, obj) contract is shared, so everything a
consumer does to the relational-mapped KG works unchanged on the
extraction pipeline's output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def doc_triples(spark):
    from simkit_spark.corpus import synthesize
    from simkit_spark.pipeline.embed import embed_distinct_surfaces
    from simkit_spark.pipeline.extract import (
        detect_mentions,
        explode_spans,
        raw_triples_from_mentions,
    )
    from simkit_spark.pipeline.link import link_entities
    from simkit_spark.pipeline.materialize import resolve_triples

    docs, _ = synthesize(spark, n_docs=120, n_entities=30, seed=42)
    mentions = detect_mentions(explode_spans(docs), with_pred=True)
    raw = raw_triples_from_mentions(mentions)
    emap = link_entities(embed_distinct_surfaces(mentions), mentions, 256, 0.75, 42)
    t = resolve_triples(raw, emap, use_salting=False)
    return t.select("subj", "pred", "obj").distinct().localCheckpoint()


def test_predicate_stats_over_pipeline_triples(doc_triples):
    from simkit_spark.kg import predicate_stats

    stats = predicate_stats(doc_triples).collect()
    assert stats, "pipeline emitted no triples"
    for r in stats:
        assert r["functionality"] >= 1.0 and r["n_subj"] <= r["n_triples"]


def test_khop_and_hubs_over_pipeline_triples(doc_triples):
    from simkit_spark.kg import khop_reachability, top_hubs

    hub = top_hubs(doc_triples, n=1).collect()[0]["entity"]
    reach = khop_reachability(doc_triples, [hub], k=2).collect()
    hops = {r["entity"]: r["hop"] for r in reach}
    assert hops[hub] == 0
    assert any(h == 1 for h in hops.values())


def test_entity_cards_over_pipeline_triples(doc_triples):
    from simkit_spark.kg import entity_cards

    cards = entity_cards(doc_triples)
    n_entities = (
        doc_triples.select(F.col("subj").alias("e"))
        .unionByName(doc_triples.select(F.col("obj").alias("e")))
        .distinct()
        .count()
    )
    assert cards.count() == n_entities
    one = cards.limit(1).collect()[0]
    assert one["card"].startswith(one["entity"] + " | ")


def test_bgp_over_pipeline_triples(doc_triples):
    from simkit_spark.kg import bgp_match

    pred = doc_triples.select("pred").first()["pred"]
    rows = bgp_match(doc_triples, [("?s", pred, "?o")]).count()
    assert rows == doc_triples.where(F.col("pred") == pred).count()
