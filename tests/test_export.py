"""Export/debug surface: edge-list CSV, dense matrix CSV (reference
saveMatrixToCSV format parity), X-matrix CSV, displayEdgeList string."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from simkit_spark.export import (
    adjacency_rows,
    display_edge_list,
    edge_list_csv,
    matrix_csv,
    x_matrix_csv,
)
from simkit_spark.operators.graphs import knn_edges, symmetrize
from simkit_spark.operators.kernels import pairwise_distances


@pytest.fixture(scope="module")
def tiny_edges(spark, tiny5):
    d = pairwise_distances(tiny5, "euclidean", n_blocks=1, directed=True)
    return symmetrize(knn_edges(d, 2).where(F.col("src") < F.col("dst"))).cache()


def _read_lines(path):
    out = []
    for f in sorted(glob.glob(f"{path}/part-*")):
        with open(f) as fh:
            out.extend(l.rstrip("\n") for l in fh if l.strip())
    return out


def test_edge_list_csv(spark, tiny_edges, tmp_path):
    p = str(tmp_path / "edges")
    edge_list_csv(tiny_edges, p, single_file=True)
    lines = _read_lines(p)
    assert lines[0].split(",") == ["src", "dst", "weight"]
    assert len(lines) - 1 == tiny_edges.count()


def test_adjacency_matrix_csv_golden(spark, tiny_edges, tiny5, tmp_path):
    rows = adjacency_rows(tiny_edges, tiny5.select("id"))
    got = {r["id"]: r["row"] for r in rows.collect()}
    assert len(got) == 5 and all(len(v) == 5 for v in got.values())
    # symmetric 2-NN graph of the golden 5-point set: p1<->p2, p3<->p4<->p5
    assert got[0][1] == 1.0 and got[1][0] == 1.0
    assert got[0][0] == 0.0
    p = str(tmp_path / "adj")
    matrix_csv(tiny_edges, tiny5.select("id"), p)
    lines = _read_lines(p)
    assert len(lines) == 5
    assert [float(x) for x in lines[0].split(",")] == [float(v) for v in got[0]]


def test_x_matrix_csv(spark, tmp_path):
    x = spark.createDataFrame(
        [(1, [0.5, -0.5]), (0, [1.0, 2.0])], "id long, vec array<double>"
    )
    p = str(tmp_path / "x")
    x_matrix_csv(x, p)
    lines = _read_lines(p)
    assert [float(v) for v in lines[0].split(",")] == [1.0, 2.0]  # id-ascending
    assert [float(v) for v in lines[1].split(",")] == [0.5, -0.5]


def test_display_edge_list(spark, tiny5):
    s = display_edge_list(tiny5, "euclidean", "knn", 2)
    assert "Distance Matrix" in s and "Adjacency Matrix (knn_2)" in s
    # golden euclidean d(p1,p2) = 1.0 appears in the rendering
    assert "1.000000" in s
    big = spark.range(500).select(
        F.col("id"), F.array(F.lit(0.0), F.lit(1.0)).alias("vec")
    )
    with pytest.raises(ValueError):
        display_edge_list(big, "euclidean", "knn", 2, max_nodes=100)
