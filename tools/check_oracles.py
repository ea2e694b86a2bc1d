"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare against its oracle_sql() via DuckDB —
row count + sorted-column value comparison (order-insensitive).

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int64", "uint32", "Int64", "int8", "int16"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as e
    from core_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    fails = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            fails.append(name)
            print(f"FAIL {name}: spark error {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        a, b = norm(sdf), norm(odf)
        status = "ok  "
        if len(a) != len(b):
            status = "FAIL"
            detail = f"rows {len(a)} vs {len(b)}"
        elif list(a.columns) != list(b.columns):
            status = "FAIL"
            detail = f"cols {list(a.columns)} vs {list(b.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True
                )
                detail = f"{len(a)} rows exact"
            except AssertionError as ex:
                status = "FAIL"
                detail = str(ex).split("\n")[0:3]
        if status == "FAIL":
            fails.append(name)
        print(f"{status} {name}: {detail} ({time.time()-t0:.1f}s)")
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
