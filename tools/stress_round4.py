"""Stress the round-4 curation/temporal operators past test scale:
interval overlap self-join at 5M intervals (hub-user skew), sorted-
neighborhood blocking at 5M records, priority sampling at 5M rows.
Prints one JSON line; paste into BENCH/STRESS.md.

All inputs are deterministic md5/xxhash expressions — no data files.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(os.environ.get("STRESS_ROWS", "5000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "stress_round4", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    out = {"rows": n, "cpus": int(cpus)}

    # --- interval overlap: 100k users, one hub user owning 2% of all
    # intervals (the skew case the per-key bucketing must absorb);
    # starts spread over 30 days, durations 0..2h, 1h buckets
    from simkit_spark.operators.intervaljoin import self_overlap_pairs

    base = spark.range(n).select(
        F.col("id"),
        F.when(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)))
        .alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(30 * 86400)).alias("start0"),
    )
    iv = base.select(
        "user_id",
        "id",
        F.col("start0").alias("start"),
        (
            F.col("start0") + F.pmod(F.xxhash64("id", F.lit(4)), F.lit(7200))
        ).alias("end"),
    ).localCheckpoint()
    t0 = time.time()
    pairs = self_overlap_pairs(iv, ["user_id"], bucket_width=3600)
    out["interval_pairs"] = pairs.count()
    out["interval_s"] = round(time.time() - t0, 2)

    # --- sorted neighborhood at 5M records, window 6: global ranks via
    # range partitioning, pair stream ~ 5 * n
    from simkit_spark.functions.blocking import sorted_neighborhood_pairs

    recs = spark.range(n).select(
        F.col("id"),
        F.md5(F.concat_ws(":", F.col("id").cast("string"), F.lit("key"))).alias(
            "key"
        ),
    ).localCheckpoint()
    t0 = time.time()
    sn = sorted_neighborhood_pairs(recs, "key", "id", window=6)
    out["sn_pairs"] = sn.count()
    out["sn_s"] = round(time.time() - t0, 2)

    # --- priority sample k=10k from 5M weighted rows
    from simkit_spark.functions.curation import priority_sample

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.lit(100) + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(10_000))).alias(
            "n_chars"
        ),
    ).localCheckpoint()
    t0 = time.time()
    ps = priority_sample(docs, "n_chars", k=10_000)
    agg = ps.agg(F.sum("w_est"), F.count(F.lit(1))).first()
    out["ps_rows"] = int(agg[1])
    out["ps_est_total"] = int(agg[0])
    out["ps_true_total"] = int(
        docs.agg(F.sum("n_chars")).first()[0]
    )
    out["ps_s"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
