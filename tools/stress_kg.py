"""Stress the kg.py operators past test scale on a hub-skewed
synthetic triple table (~10M triples, deterministic):

  subj  = s:<i mod n_subj>                (bounded out-degree ~5)
  pred  = p<i mod 5>
  obj   = 10% of edges hit 1k hot objects (hubs, in-degree ~10^3-10^4);
          the rest spread over 1M cold objects
  plus `mega` extra subjects of out-degree 50k each — the degenerate
  case the cooccurrence/cards caps exist for (one 50k-degree subject
  alone would emit 1.25e9 co-occurrence pairs).

Measured: top_hubs (agg + distributed top-n), khop from a hub
(frontier explosion), entity_cards with the degree cap (hub drop
before collect_list), cooccurrence_edges with/without the mega
subjects present (the cap must make them invisible), negative_samples
(linear map + anti-join). Prints one JSON line; paste into
BENCH/STRESS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simkit_spark.session import get_spark  # noqa: E402


def synth_triples(spark, n: int, n_subj: int, mega: int = 4, mega_deg: int = 50_000):
    base = spark.range(n).select(
        F.concat(F.lit("s:"), (F.col("id") % n_subj).cast("string")).alias("subj"),
        F.concat(F.lit("p"), (F.col("id") % 5).cast("string")).alias("pred"),
        F.when(
            F.xxhash64("id") % 10 == 0,
            F.concat(F.lit("o:"), (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("o:"), (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000))).cast("string"))
        )
        .alias("obj"),
    )
    hubs = spark.range(mega * mega_deg).select(
        F.concat(F.lit("mega:"), (F.col("id") % mega).cast("string")).alias("subj"),
        F.lit("p0").alias("pred"),
        F.concat(F.lit("o:"), F.col("id").cast("string")).alias("obj"),
    )
    return base.unionByName(hubs)


def main() -> None:
    from simkit_spark.kg import (
        cooccurrence_edges,
        entity_cards,
        khop_reachability,
        negative_samples,
        top_hubs,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("stress_kg", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    n = int(os.environ.get("STRESS_KG_TRIPLES", "10000000"))
    tri = synth_triples(spark, n, n_subj=2_000_000).localCheckpoint()
    out: dict[str, object] = {"n_triples": tri.count(), "cpus": int(cpus)}

    t0 = time.time()
    hubs = top_hubs(tri, n=20).collect()
    out["top_hubs_s"] = round(time.time() - t0, 2)
    out["top_hub_degree"] = hubs[0]["degree"]

    seed = hubs[0]["entity"] if hubs[0]["entity"].startswith("o:") else "o:0"
    t0 = time.time()
    reach = khop_reachability(tri, [seed], k=2)
    out["khop2_rows"] = reach.count()
    out["khop2_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    cards = entity_cards(tri, max_degree=2000)
    out["cards_rows"] = cards.count()
    out["cards_s"] = round(time.time() - t0, 2)

    # cap ON (default 1000): the four 50k-degree mega subjects are
    # dropped before the self-join — pair count stays at the bounded
    # base graph's level instead of +4 * C(50k, 2) = +5e9
    t0 = time.time()
    cooc = cooccurrence_edges(tri, "p0", max_per_subject=1000, min_count=2)
    out["cooc_pairs"] = cooc.count()
    out["cooc_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    neg = negative_samples(tri, "p0", "o", n_objects=1_000_000, n_neg=1)
    out["neg_rows"] = neg.count()
    out["neg_s"] = round(time.time() - t0, 2)

    # TransE eval over a 10k-candidate space, blocked 4 ways: the
    # scored stream is |distinct p1 triples| x 10k rows of pure
    # codegen arithmetic — the candidates-broadcast regime
    from simkit_spark.kg import rdfs_entail, transe_rank

    t0 = time.time()
    tr = transe_rank(
        tri.where(F.col("subj").startswith("s:")).limit(200_000),
        "p1", "o", n_objects=10_000, dim=8, candidate_blocks=4,
    )
    out["transe_rows"] = tr.count()
    out["transe_s"] = round(time.time() - t0, 2)

    # RDFS entailment over the full 10M-triple stream: 5-property
    # hierarchy + domain/range typing -> every triple re-derived under
    # a superproperty + 2-level type rows, one distinct at the end
    schema = [
        ("p0", "subPropertyOf", "rel"), ("p1", "subPropertyOf", "rel"),
        ("rel", "subPropertyOf", "any"),
        ("p0", "domain", "class:S"), ("p0", "range", "class:O"),
        ("class:S", "subClassOf", "class:E"), ("class:O", "subClassOf", "class:E"),
    ]
    t0 = time.time()
    ent = rdfs_entail(tri, schema)
    out["rdfs_rows"] = ent.count()
    out["rdfs_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
