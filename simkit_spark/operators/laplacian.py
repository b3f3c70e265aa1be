"""Degree + normalized-Laplacian operators over edge-list DataFrames.

Reference (src/src/main/java/eigendecomposed/MatrixCalculation.java)
computes dense n x n matrices on the driver; here degree is a groupBy
aggregation and each "Laplacian" is a reweighting join — O(|E|) with
map-side partial aggregation, no n x n anywhere.

Semantics notes (preserved quirks):
  * degree = column L1 norm = sum of |weight| over incident edges
    (MatrixCalculation.java:161-173).
  * "sym" is D^(-1/2) A D^(-1/2) — the *normalized affinity*, NOT
    I - D^(-1/2) A D^(-1/2) (MatrixCalculation.java:182-197). Spectral
    code therefore takes the LARGEST eigenpairs (EigenCalculation.java:
    289,305).
  * "rw" is D^(-1) A (MatrixCalculation.java:206-221).
  * "ad": D_local(i) = sum_{j in N+(i)} deg(j) / deg(i) over strictly
    positive-weight neighbors; L = D_local^(-1/2) A D_local^(-1/2)
    (MatrixCalculation.java:230-269).
  * isolated / zero-degree nodes get normalization factor 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """(id, degree): degree = COLUMN L1 norm = sum(|weight|) over
    in-edges (MatrixCalculation.java:161-173 sums columns). For
    symmetric graphs this equals the usual degree; for the directed kNN
    graph it is the in-degree — a reference quirk we preserve (verified
    against the degree_mat_knn golden in MatrixCalculationTest)."""
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum(F.abs(F.col("weight"))).alias("degree")
    )


def _inv(col, power: str):
    safe = F.when(F.col(col) > 0, F.col(col))
    if power == "inv_sqrt":
        return F.coalesce(1.0 / F.sqrt(safe), F.lit(0.0))
    return F.coalesce(1.0 / safe, F.lit(0.0))


def laplacian(sym_edges: DataFrame, kind: str = "sym", deg: DataFrame | None = None) -> DataFrame:
    """Reweight a symmetric edge list into the chosen normalized form.

    Returns (src, dst, weight) with both orientations, matching the
    dense reference output entry-for-entry on the non-zero pattern.
    """
    if deg is None:
        deg = degrees(sym_edges)
    if kind == "sym":
        d = deg.select("id", _inv("degree", "inv_sqrt").alias("f"))
        return (
            sym_edges.join(d.withColumnRenamed("id", "src").withColumnRenamed("f", "fs"), "src", "left")
            .join(d.withColumnRenamed("id", "dst").withColumnRenamed("f", "fd"), "dst", "left")
            .select(
                "src",
                "dst",
                (
                    F.col("weight")
                    * F.coalesce(F.col("fs"), F.lit(0.0))
                    * F.coalesce(F.col("fd"), F.lit(0.0))
                ).alias("weight"),
            )
        )
    if kind == "rw":
        d = deg.select("id", _inv("degree", "inv").alias("f"))
        return (
            sym_edges.join(d.withColumnRenamed("id", "src"), "src", "left")
            .select(
                "src",
                "dst",
                (F.col("weight") * F.coalesce(F.col("f"), F.lit(0.0))).alias("weight"),
            )
        )
    if kind == "ad":
        # D_local(i) = sum of deg(j) over neighbors j with a_ij > 0, / deg(i)
        dd = deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "deg_dst")
        local = (
            sym_edges.where(F.col("weight") > 0)
            .join(dd, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("deg_dst").alias("nbr_deg_sum"))
            .join(deg, "id")
            .select(
                "id",
                F.when(F.col("degree") > 0, F.col("nbr_deg_sum") / F.col("degree"))
                .otherwise(F.lit(0.0))
                .alias("d_local"),
            )
        )
        d = local.select("id", _inv("d_local", "inv_sqrt").alias("f"))
        return (
            sym_edges.join(d.withColumnRenamed("id", "src").withColumnRenamed("f", "fs"), "src", "left")
            .join(d.withColumnRenamed("id", "dst").withColumnRenamed("f", "fd"), "dst", "left")
            .select(
                "src",
                "dst",
                (
                    F.col("weight")
                    * F.coalesce(F.col("fs"), F.lit(0.0))
                    * F.coalesce(F.col("fd"), F.lit(0.0))
                ).alias("weight"),
            )
        )
    raise ValueError(f"unknown laplacian kind {kind!r} (sym|rw|ad)")
