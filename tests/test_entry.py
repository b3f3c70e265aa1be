"""Contract tests for __spark_entry__: every oracled query has a
matching queries() entry, entry() smoke at sf0.001, and a sampled
oracle cross-check (the full sweep runs via tools/check_oracle.py)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_oracle_keys_subset():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 25


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "cluster"}


@pytest.mark.parametrize("name", ["token_count", "knn_graph", "exact_dedup"])
def test_oracle_sample(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    got = entry_mod.queries()[name](spark, SF).toPandas()
    want = con.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    g = got.reindex(sorted(got.columns), axis=1).sort_values(sorted(got.columns)).reset_index(drop=True)
    w = want.reindex(sorted(want.columns), axis=1).sort_values(sorted(want.columns)).reset_index(drop=True)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            assert (abs(g[c] - w[c]) < 1e-9).all(), c
        else:
            assert (g[c].astype(str) == w[c].astype(str)).all(), c


def test_driver_mem_scales_with_local_slots(monkeypatch):
    # local mode = one JVM for all "executors": the heap cap must grow
    # with task slots or concurrent tasks trade the parallelism for GC
    # (measured: 1M-doc extraction at local[32] took 26.8s under 16g vs
    # 7.2s under 48g). Non-local masters keep the plain driver default.
    from simkit_spark.session import _driver_mem

    monkeypatch.delenv("SPARK_DRIVER_MEM", raising=False)
    assert _driver_mem("local[8]") == "16g"
    assert _driver_mem("local[32]") == "48g"
    assert _driver_mem("local[4,2]") == "16g"
    assert _driver_mem("yarn") == "16g"
    monkeypatch.setenv("SPARK_DRIVER_MEM", "9g")
    assert _driver_mem("local[32]") == "9g"
