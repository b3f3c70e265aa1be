"""Mini driver-twin: run selected queries() entries vs oracle_sql() on
DuckDB at sf0.01 and report rows/schema/value-hash matches. Usage:

    python tools/oracle_check.py [query ...]   # default: all oracled
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            # pandas resolution (ns vs us) is a representation detail,
            # not a value difference — the driver hashes values only
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import __spark_entry__ as e
    from simkit_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = e.queries()
    sqls = e.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in sqls]
    bad = 0
    for name in names:
        try:
            got = qs[name](spark, SF_DIR).toPandas()
            want = con.execute(sqls[name]).df()
            g, w = norm(got), norm(want)
            rows = len(g) == len(w)
            schema = list(g.columns) == list(w.columns)
            if rows and schema:
                try:
                    pd.testing.assert_frame_equal(
                        g, w, check_dtype=True, check_exact=False, rtol=0, atol=1e-9
                    )
                    ok = True
                except AssertionError as ex:
                    ok = False
                    print(f"  diff: {str(ex)[:300]}")
            else:
                ok = False
            status = "OK " if (rows and schema and ok) else "FAIL"
            if not (rows and schema and ok):
                bad += 1
            print(f"{status} {name}: rows {len(g)}/{len(w)} schema={schema} values={ok}")
            if not schema:
                print(f"  spark cols: {list(g.columns)}  oracle cols: {list(w.columns)}")
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:400]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
