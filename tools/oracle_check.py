#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify output vs DuckDB oracle.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>, load the Spark-written parquet and
the DuckDB result of oracle_sql.json[name] over views named after the tables
in <sfDir>, then compare schema-insensitively: columns sorted by name, rows
sorted, values compared exactly (floats bit-for-bit via repr).
"""
import json, sys, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(repr(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = pd.read_parquet(qdir)
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
            n_bad += 1
        elif a == b:
            print(f"ok   {name} ({len(a)} rows)"); n_ok += 1
        else:
            print(f"FAIL {name}: {len(a)} vs {len(b)} rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at row {i}:\n   spark {x}\n   duck  {y}")
                    break
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
