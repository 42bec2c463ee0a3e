"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin side-by-side at sf0.01, compare row count,
column names, and an order-insensitive value frame. Usage:
  python BENCH/check_oracles.py [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in oracles]
    fails = 0
    for name in names:
        try:
            got = norm(qs[name](spark, SF_DIR).toPandas())
            want = norm(con.sql(oracles[name]).df())
            ok_rows = len(got) == len(want)
            ok_cols = list(got.columns) == list(want.columns)
            ok_vals = ok_rows and ok_cols and got.equals(want)
            status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
            print(f"{status} {name}: rows {len(got)}/{len(want)} cols={ok_cols} vals={ok_vals}")
            if status == "FAIL":
                fails += 1
                if ok_rows and ok_cols:
                    diff = (got != want).any(axis=1)
                    print("  first diffs:\n", got[diff].head(3), "\n", want[diff].head(3))
                else:
                    print("  got cols:", list(got.columns), "want:", list(want.columns))
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} / {len(names)} checked")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
