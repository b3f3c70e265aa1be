"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare
row count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entry  # noqa: E402
from simkit_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"schema: {sorted(got.columns)} vs {sorted(want.columns)}"]
    if len(got) != len(want):
        issues.append(f"rows: {len(got)} vs {len(want)}")
        return issues
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        # the driver hashes TYPED values: an int64 column vs a float64
        # column hash-mismatches even when every value is numerically
        # equal (the round-1 events_sessionize red cell) — flag it
        gk = "datetime" if str(g[c].dtype).startswith("datetime") else g[c].dtype.kind
        wk = "datetime" if str(w[c].dtype).startswith("datetime") else w[c].dtype.kind
        if gk != wk and {gk, wk} <= {"i", "u", "f"}:
            issues.append(
                f"col {c}: dtype kind mismatch {g[c].dtype} vs {w[c].dtype} "
                "(driver value-hash WILL differ even if values match)"
            )
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
            a = g[c].astype(float).to_numpy()
            b = w[c].astype(float).to_numpy()
            bad = ~np.isclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
            if bad.any():
                i = int(np.argmax(bad))
                issues.append(f"col {c}: {bad.sum()} mismatches, e.g. {a[i]} vs {b[i]}")
            exact = (a == b) | (np.isnan(a) & np.isnan(b))
            if not exact.all() and not bad.any():
                issues.append(f"col {c}: WARNING {np.sum(~exact)} non-bitwise (within 1e-9)")
        else:
            if not g[c].equals(w[c].astype(g[c].dtype, errors="ignore")):
                neq = (g[c] != w[c]).sum()
                if neq:
                    i = (g[c] != w[c]).idxmax()
                    issues.append(f"col {c}: {neq} mismatches, e.g. {g[c][i]!r} vs {w[c][i]!r}")
    return issues


def main():
    sf = "/root/testdata/sf0.01"
    names = sys.argv[1:] or None
    qs, oracles = entry.queries(), entry.oracle_sql()
    spark = get_spark("check_oracle", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    failed = []
    for name in (names or qs):
        if name not in oracles:
            if names:
                df = qs[name](spark, sf)
                print(f"{name}: rows-only -> {df.count()} rows")
            continue
        try:
            got = qs[name](spark, sf).toPandas()
            want = con.sql(oracles[name]).df()
            issues = compare(got, want)
        except Exception as e:  # noqa: BLE001
            issues = [f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"]
        if issues:
            failed.append(name)
            print(f"FAIL {name}: " + " | ".join(issues))
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{len(failed)} failed: {failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
