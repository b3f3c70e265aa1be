"""Stress NN-descent vs the exact block kernel: the crossover claim
("replaces the quadratic all-pairs kernel") measured. 10k blob points:
both run, recall computed; 50k points: NN-descent only (the exact
kernel's 1.25e9 pairs is exactly the job we refuse to run). Prints one
JSON line; paste into BENCH/STRESS.md."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from simkit_spark.session import get_spark  # noqa: E402


def blobs(spark, n, dim=64, n_blobs=100, seed=7, parts=32):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (n_blobs, dim))
    ids = np.arange(n)
    vecs = centers[ids % n_blobs] + rng.normal(0, 1, (n, dim))
    pdf = [(int(i), v.tolist()) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(pdf, "id long, vec array<double>").repartition(
        parts
    ).localCheckpoint()


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "stress_nnd", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    from simkit_spark.operators.kernels import pairwise_topk
    from simkit_spark.operators.nndescent import nn_descent

    res = {"cpus": int(cpus)}

    n1 = int(os.environ.get("STRESS_NND_N1", "10000"))
    df = blobs(spark, n1)
    t0 = time.time()
    exact = pairwise_topk(df, 10, "euclidean").select("src", "dst")
    ex = {(r.src, r.dst) for r in exact.collect()}
    res["exact_10k_secs"] = round(time.time() - t0, 2)
    t0 = time.time()
    nnd = nn_descent(df, k=10, id_space=n1, n_iter=5, cap=25, seed=42)
    got = {(r.src, r.dst) for r in nnd.select("src", "dst").collect()}
    res["nnd_10k_secs"] = round(time.time() - t0, 2)
    res["nnd_10k_recall"] = round(len(got & ex) / len(ex), 4)

    n2 = int(os.environ.get("STRESS_NND_N2", "50000"))
    df2 = blobs(spark, n2)
    t0 = time.time()
    nnd2 = nn_descent(df2, k=10, id_space=n2, n_iter=5, cap=25, seed=42)
    rows = nnd2.count()
    res["nnd_50k_secs"] = round(time.time() - t0, 2)
    res["nnd_50k_rows"] = rows
    # sampled recall at 50k: exact top-10 for 200 md5-chosen probes via
    # a broadcast-probe scan (cheap), compared against the graph rows
    probes = [int(x) for x in np.random.default_rng(1).choice(n2, 200, False)]
    pv = df2.where(F.col("id").isin(probes)).collect()
    bc = {r.id: np.array(r.vec) for r in pv}
    allv = df2.collect()
    mat = np.array([r.vec for r in allv])
    ids = np.array([r.id for r in allv])
    hits = tot = 0
    gset = got2 = {(r.src, r.dst) for r in nnd2.where(
        F.col("src").isin(probes)).select("src", "dst").collect()}
    for p, v in bc.items():
        d = np.sqrt(((mat - v) ** 2).sum(axis=1))
        order = np.lexsort((ids, d))
        top = [int(ids[i]) for i in order if int(ids[i]) != p][:10]
        hits += sum((p, t) in gset for t in top)
        tot += len(top)
    res["nnd_50k_sampled_recall"] = round(hits / tot, 4)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
