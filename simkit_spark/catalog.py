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
        from pyspark.sql import Observation  # noqa: PLC0415

        # lineage metrics ride the WRITE job via observe(): count +
        # xor-of-row-hashes are collected while the rows stream to the
        # sink, so the manifest costs zero extra scans (the old design
        # re-read the whole table after writing — a full second pass
        # over the data per stage, untenable at 100 TB). xor is
        # associative+commutative, so the hash is order- and
        # partitioning-independent; computed over the logical columns
        # only (never the derived _bucket routing column).
        obs = Observation()
        cols = df.columns
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("c"),
            F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in cols])).alias("h"),
        )
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
        got = self._observed(obs, name)
        manifest = {
            "table": name,
            "stage": stage or name,
            "row_count": int(got["c"]),
            "content_hash": str(got["h"] or 0),
            "inputs": inputs or {},
            "partitions": self._partition_audit(name),
            "ts": time.time(),
        }
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

    def _observed(self, obs, name: str) -> dict:
        """Resolve the write job's observed metrics. `Observation.get`
        blocks until the metrics arrive and has NO timeout — fine on the
        parquet branch (observe() on a V1 write is long-established),
        but the Iceberg branch goes through a V2 write command this
        sandbox cannot exercise (no runtime jar). If a deployment's
        V2 path ever fails to surface the CollectMetrics result, fall
        back to one aggregation over the freshly written table instead
        of hanging every stage write forever."""
        if not self.use_iceberg:
            return obs.get
        import concurrent.futures  # noqa: PLC0415

        with concurrent.futures.ThreadPoolExecutor(1) as ex:
            fut = ex.submit(lambda: obs.get)
            try:
                return fut.result(timeout=120)
            except concurrent.futures.TimeoutError:
                back = self.read(name)
                cols = [c for c in back.columns if c != "_bucket"]
                return (
                    back.agg(
                        F.count(F.lit(1)).alias("c"),
                        F.bit_xor(
                            F.xxhash64(*[F.col(c).cast("string") for c in cols])
                        ).alias("h"),
                    )
                    .first()
                    .asDict()
                )

    # -- lineage -------------------------------------------------------
    def _partition_audit(self, name: str) -> list | None:
        """Per-partition (dir, rows, bytes) from parquet FOOTERS — pure
        metadata reads on the driver (a few KB per file), no data scan.
        Doubles as the skew audit: one oversized bucket is visible here
        before it stalls a downstream join. Iceberg keeps this in its
        own manifests, so the branch records nothing extra.

        Footer walking needs driver-local file access; for a remote
        warehouse (s3a://, hdfs://) the manifest records ``None`` —
        "audit unavailable", distinguishable from a real empty table —
        rather than silently pretending the table has no partitions
        (swap the walk for the Hadoop FileSystem API when deploying
        against object stores)."""
        if self.use_iceberg:
            return []
        try:  # pragma: no cover - pyarrow is a hard dep in practice
            import pyarrow.parquet as pq  # noqa: PLC0415
        except ImportError:  # pragma: no cover
            return None
        root = self._path(name)
        if not os.path.isdir(root):
            return None
        agg: dict[str, list[int]] = {}
        for dirpath, _dirs, files in os.walk(root):
            part = os.path.relpath(dirpath, root)
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                p = os.path.join(dirpath, fn)
                ent = agg.setdefault("" if part == "." else part, [0, 0])
                ent[0] += pq.ParquetFile(p).metadata.num_rows
                ent[1] += os.path.getsize(p)
        return sorted([d, c, b] for d, (c, b) in agg.items())

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
