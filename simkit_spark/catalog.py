"""Table store with per-stage lineage manifests and checkpoint-resume.

The reference persists every pipeline stage into Neo4j (nodes/edges per
stage label, global/Neo4jGraphHandler.java throughout); the rebuild
persists each stage as a *table* whose write is the checkpoint boundary
(north_rule: "checkpoint-resumable stage boundaries ... per-partition
lineage manifests").

On a real cluster this is an Iceberg catalog (`df.writeTo(name)
.partitionedBy(bucket(N, "doc_id")).createOrReplace()`); this sandbox
ships no Iceberg runtime jar, so TableStore speaks the same verbs over
a parquet warehouse and keeps the lineage manifest itself. The pipeline
code only touches TableStore, so swapping in Iceberg is a one-class
change (set use_iceberg=True with a configured catalog).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class TableStore:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        use_iceberg: bool = False,
        catalog: str = "kg",
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.use_iceberg = use_iceberg
        self.catalog = catalog
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.warehouse, f"_manifest_{name}.json")

    # -- io ------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, str] | None = None,
        stage: str | None = None,
        inputs: dict | None = None,
    ) -> dict:
        """Write a stage table + lineage manifest. Returns the manifest.

        bucket_by=(N, col) approximates Iceberg's bucket(N, col)
        partition transform: rows are routed to N stable hash buckets so
        downstream joins on `col` are co-located and skew is bounded.
        """
        if self.use_iceberg:
            self.iceberg_writer(df, name, partition_by, bucket_by).createOrReplace()
        else:
            out = df
            w = None
            if bucket_by is not None:
                n, col = bucket_by
                out = df.withColumn("_bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(n)).cast("int"))
                out = out.repartition(n, "_bucket")
                w = out.write.mode("overwrite").partitionBy("_bucket")
            elif partition_by:
                w = out.write.mode("overwrite").partitionBy(*partition_by)
            else:
                w = out.write.mode("overwrite")
            w.parquet(self._path(name))
        manifest = self._build_manifest(name, stage or name, inputs or {})
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f, indent=1)
        return manifest

    def iceberg_writer(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, str] | None = None,
    ):
        """Build the DataFrameWriterV2 for the Iceberg branch:
        `writeTo(catalog.name).using("iceberg").partitionedBy(
        bucket(N, col))` — the north_rule's `bucket(N, doc_id)`
        partition transform. Split out so the writer construction is
        contract-testable without an Iceberg runtime jar (this sandbox
        ships none; see the TableStore docstring)."""
        from pyspark.sql import functions as F  # noqa: PLC0415
        from pyspark.sql.functions import partitioning  # noqa: PLC0415

        writer = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
        if bucket_by is not None:
            n, col = bucket_by
            # partitioning.bucket replaces the F.bucket deprecated in
            # Spark 4.0 (same Iceberg partition transform)
            writer = writer.partitionedBy(partitioning.bucket(n, F.col(col)))
        elif partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        return writer

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.catalog}.{name}")
        df = self.spark.read.parquet(self._path(name))
        return df.drop("_bucket") if "_bucket" in df.columns else df

    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- lineage -------------------------------------------------------
    def _build_manifest(self, name: str, stage: str, inputs: dict) -> dict:
        df = self.read(name)
        # ONE scan: per-partition (count, xor-of-row-hashes); the global
        # content hash folds the partition hashes driver-side (xor is
        # associative+commutative, so the result is order- and
        # partitioning-independent); per-partition counts double as the
        # skew audit.
        per = (
            df.groupBy(F.spark_partition_id().alias("p"))
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.bit_xor(
                    F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
                ).alias("h"),
            )
            .collect()
        )
        n = sum(r["c"] for r in per)
        h = 0
        for r in per:
            h ^= r["h"] or 0
        return {
            "table": name,
            "stage": stage,
            "row_count": n,
            "content_hash": str(h),
            "inputs": inputs,
            "partitions": sorted((r["p"], r["c"]) for r in per),
            "ts": time.time(),
        }

    # -- checkpoint/resume ---------------------------------------------
    def run_stage(
        self,
        name: str,
        fn,
        inputs: dict | None = None,
        force: bool = False,
        **write_kwargs,
    ) -> DataFrame:
        """Execute fn() -> DataFrame and persist it as `name`, unless a
        completed manifest with the same input fingerprint exists (then
        resume = read the table back, skipping the compute)."""
        inputs = inputs or {}
        if not force and self.exists(name):
            m = self.manifest(name)
            if m and m.get("inputs") == inputs:
                return self.read(name)
        df = fn()
        self.write(df, name, stage=name, inputs=inputs, **write_kwargs)
        return self.read(name)
