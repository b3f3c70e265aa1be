"""spark-submit entry point for the KG-construction pipeline.

Cluster launch (north_rule: "run via spark-submit --py-files on a
multi-executor cluster"):

    python tools/package.py                       # -> dist/simkit_spark.zip
    spark-submit --py-files dist/simkit_spark.zip \
        --master <cluster> \
        simkit_spark/pipeline/__main__.py \
        --input <iceberg-or-parquet documents table> \
        --warehouse /path/to/stage-tables \
        --seed 42

Without --input, a deterministic synthetic corpus of --n-docs documents
is generated (same schema as the production Iceberg table:
documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)).
Re-running with the same --warehouse resumes from the last completed
stage (manifest match).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="simkit_spark.pipeline")
    ap.add_argument("--input", help="documents table path (parquet/Iceberg); omit to synthesize")
    ap.add_argument("--warehouse", required=True, help="stage-table + manifest directory")
    ap.add_argument("--n-docs", type=int, default=10000, help="synthetic corpus size")
    ap.add_argument("--n-entities", type=int, default=200)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tau", type=float, default=0.65, help="linking cosine threshold")
    ap.add_argument("--dim", type=int, default=256, help="surface embedding dim")
    ap.add_argument("--force", action="store_true", help="recompute all stages")
    ap.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # absolute imports: under `spark-submit path/to/__main__.py` this
    # file runs as a bare script (module __main__, no package parent),
    # where relative imports raise ImportError — the package itself
    # arrives via --py-files
    from simkit_spark.catalog import TableStore
    from simkit_spark.corpus import synthesize
    from simkit_spark.pipeline.run import PipelineConfig, run_pipeline

    if args.master:
        from simkit_spark.session import get_spark

        spark = get_spark("simkit_spark_pipeline", master=args.master)
    else:
        spark = SparkSession.builder.appName("simkit_spark_pipeline").getOrCreate()

    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        docs, _ = synthesize(spark, n_docs=args.n_docs, n_entities=args.n_entities, seed=args.seed)

    t0 = time.time()
    cfg = PipelineConfig(seed=args.seed, tau=args.tau, dim=args.dim)
    out = run_pipeline(spark, docs, TableStore(spark, args.warehouse), cfg, force=args.force)
    n_triples = out["triples"].count()
    n_entities = out["nodes"].count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "triples": n_triples,
                "entities": n_entities,
                "secs": round(dt, 2),
                "warehouse": args.warehouse,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
