"""triangle_counts: hand-verified counts, duplicate/orientation
robustness, and the degree-ordered wedge bound."""

from __future__ import annotations

from simkit_spark.operators.triangles import triangle_counts


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: (r["degree"], r["triangles"], r["coeff"]) for r in
            triangle_counts(df).collect()}


def test_k4_plus_pendant(spark):
    # K4 on {1,2,3,4} (every node in 3 triangles, coeff 1.0) + pendant 5
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = _run(spark, k4 + [(1, 5)])
    assert out[2] == (3, 3, 1.0) and out[3] == (3, 3, 1.0) and out[4] == (3, 3, 1.0)
    assert out[1] == (4, 3, 0.5)  # 2*3/(4*3)
    assert out[5] == (1, 0, 0.0)


def test_duplicates_reversals_and_self_loops_ignored(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    noisy = tri + [(2, 1), (3, 2), (1, 1), (1, 2)]
    assert _run(spark, noisy) == _run(spark, tri)
    assert _run(spark, tri)[1] == (2, 1, 1.0)


def test_star_has_no_triangles(spark):
    # hot node: high degree, zero closure — the skew case the
    # degree-ordered orientation bounds (hub is every edge's HIGH end,
    # so its out-degree under orientation is 0, not n)
    star = [(0, i) for i in range(1, 30)]
    out = _run(spark, star)
    assert out[0] == (29, 0, 0.0)
    assert all(out[i] == (1, 0, 0.0) for i in range(1, 30))
