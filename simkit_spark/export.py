"""Debug/export surface: edge-list and matrix CSV export plus the
string-rendering debug procedures.

Rebuilds the reference's export functions
(`SimKitProcedures.java:1114-1306`: displayEdgeList / getMatrix /
saveMatrixToCSV) Spark-first:

  * the EDGE LIST is the native representation — exporting it is one
    distributed `write.csv`, partitioned however the caller likes;
  * the dense matrix form exists only as a *rendering* for debugging
    small graphs (the reference materializes Double[n][n] everywhere;
    here the dense rows are built as map-lookup column expressions and
    only ever written row-wise, so an export of a 10^6-node graph
    streams instead of allocating n^2 doubles anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edge_list_csv(edges: DataFrame, path: str, single_file: bool = False) -> None:
    """Export (src, dst, weight|dist) edges as CSV with header — the
    Spark-native replacement for the reference's per-row Neo4j edge
    dump. ``single_file=True`` coalesces to one part (debug scale
    only)."""
    out = edges.coalesce(1) if single_file else edges
    out.write.mode("overwrite").option("header", True).csv(path)


def adjacency_rows(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Dense adjacency rows (id, row: array<double>) in ascending-id
    column order — `MatrixCalculation.convertToAdjacencyMatrix`
    (getMatrix 'adjacency' branch) as a per-row map lookup: each row is
    built independently from that node's out-edges, so the full n x n
    never exists on any single node. Intended for debug/export sizes
    (the column-id array is a literal in the plan)."""
    ids = [r["id"] for r in nodes.select("id").distinct().orderBy("id").collect()]
    id_arr = F.array(*[F.lit(int(i)) for i in ids])
    m = edges.groupBy("src").agg(
        F.map_from_arrays(F.collect_list("dst"), F.collect_list("weight")).alias("m")
    )
    return (
        nodes.select("id")
        .join(m.withColumnRenamed("src", "id"), "id", "left")
        .select(
            "id",
            F.transform(
                id_arr, lambda d: F.coalesce(F.element_at(F.col("m"), d), F.lit(0.0))
            ).alias("row"),
        )
    )


def _rows_to_csv_lines(rows: DataFrame, vec_col: str) -> DataFrame:
    return rows.orderBy("id").select(
        F.concat_ws(
            ",", F.transform(F.col(vec_col), lambda x: x.cast("string"))
        ).alias("value")
    )


def matrix_csv(
    edges: DataFrame, nodes: DataFrame, path: str, single_file: bool = True
) -> None:
    """Adjacency matrix -> CSV, one comma-joined row per line in
    ascending-id order — `saveMatrixToCSV` (SimKitProcedures.java:
    1292-1306) format parity (no header)."""
    lines = _rows_to_csv_lines(adjacency_rows(edges, nodes), "row")
    out = lines.coalesce(1) if single_file else lines
    out.write.mode("overwrite").text(path)


def x_matrix_csv(x: DataFrame, path: str, single_file: bool = True) -> None:
    """Eigenvector X matrix (id, vec) -> CSV rows in ascending-id order
    — getMatrix's 'x_matrix' branch."""
    lines = _rows_to_csv_lines(x, "vec")
    out = lines.coalesce(1) if single_file else lines
    out.write.mode("overwrite").text(path)


def display_edge_list(
    points: DataFrame,
    distance_measure: str,
    graph_type: str,
    parameter: float,
    max_nodes: int = 200,
) -> str:
    """String rendering of the distance matrix + affinity graph for a
    small point set — `displayEdgeList` (SimKitProcedures.java:
    1114-1258). Debug-only by contract: refuses more than
    ``max_nodes`` rows instead of silently materializing n^2 driver
    memory (the reference renders the full matrix as one string and
    would OOM first)."""
    from .operators.graphs import build_affinity_graph
    from .operators.kernels import pairwise_distances

    n = points.count()
    if n > max_nodes:
        raise ValueError(
            f"display_edge_list renders dense matrices: {n} nodes > max_nodes={max_nodes}"
        )
    dist = pairwise_distances(points, distance_measure, n_blocks=1, directed=True)
    affinity = build_affinity_graph(dist, graph_type, parameter)
    ids = sorted(r["id"] for r in points.select("id").collect())
    pos = {i: p for p, i in enumerate(ids)}
    dmat = [[0.0] * n for _ in range(n)]
    for r in dist.collect():
        dmat[pos[r["src"]]][pos[r["dst"]]] = r["dist"]
    amat = [[0.0] * n for _ in range(n)]
    for r in affinity.collect():
        amat[pos[r["src"]]][pos[r["dst"]]] = r["weight"]
    def render(m):
        return "\n".join(", ".join(f"{v:.6f}" for v in row) for row in m)

    return (
        "Graph Data: \n\nDistance Matrix:\n"
        + render(dmat)
        + f"\n\nAdjacency Matrix ({graph_type}_{parameter}):\n"
        + render(amat)
    )
