"""link_prediction: hand-verified common-neighbor / Jaccard /
Adamic-Adar scores, existing-edge exclusion, and the hub cap."""

from __future__ import annotations

import math

from simkit_spark.operators.linkpred import link_prediction


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r["u"], r["w"]): (r["cn"], r["jaccard"], r["adamic_adar"])
        for r in link_prediction(df, **kw).collect()
    }


def test_square_diagonals(spark):
    # C4: 1-2-3-4-1. Non-edges are the diagonals (1,3) and (2,4),
    # each with cn=2, deg 2 everywhere -> jaccard 2/(2+2-2)=1,
    # aa = 2/ln(2)
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert set(out) == {(1, 3), (2, 4)}
    cn, jac, aa = out[(1, 3)]
    assert cn == 2 and abs(jac - 1.0) < 1e-12
    assert abs(aa - 2.0 / math.log(2.0)) < 1e-12


def test_existing_edges_excluded_min_cn(spark):
    # K3 + pendant: every non-edge pair has <=1 common neighbor
    out = _run(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert out == {}
    # min_cn=1 admits (1,4) and (2,4) through wedge center 3 (deg 3)
    out1 = _run(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], min_cn=1)
    assert set(out1) == {(1, 4), (2, 4)}
    cn, jac, aa = out1[(1, 4)]
    assert cn == 1 and abs(jac - 1.0 / (2 + 1 - 1)) < 1e-12
    assert abs(aa - 1.0 / math.log(3.0)) < 1e-12


def test_orientation_and_duplicates_ignored(spark):
    base = [(1, 2), (2, 3), (3, 4), (4, 1)]
    noisy = base + [(2, 1), (3, 2), (1, 1), (1, 2)]
    assert _run(spark, base) == _run(spark, noisy)


def test_hub_cap_prunes_wedge_centers_only(spark):
    # star center 0 with 10 leaves: every leaf pair scores through the
    # hub; capping below the hub degree removes ALL candidates (leaves
    # have deg 1, contributing no wedges)
    star = [(0, i) for i in range(1, 11)]
    assert len(_run(spark, star, min_cn=1)) == 45
    assert _run(spark, star, min_cn=1, max_degree=5) == {}
    # but endpoint degrees in surviving scores stay exact: add a square
    # 20-21-22-23 whose centers have deg 2 <= cap
    sq = [(20, 21), (21, 22), (22, 23), (23, 20)]
    out = _run(spark, star + sq, min_cn=1, max_degree=5)
    assert set(out) == {(20, 22), (21, 23)}
    assert out[(20, 22)][0] == 2
