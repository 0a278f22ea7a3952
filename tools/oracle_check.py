#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify output vs DuckDB oracle.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--budget SECONDS]

For each query dir under <verifyOutDir>, load the Spark-written parquet and
the DuckDB result of oracle_sql.json[name] over views named after the tables
in <sfDir>, then compare schema-insensitively: columns sorted by name, rows
sorted, values compared exactly (floats bit-for-bit via repr).

--budget S fails any query whose DuckDB oracle alone takes more than S
seconds of wall clock. A single pathological oracle (e.g. an unrolled CTE
that DuckDB inlines exponentially) can starve the driver's whole-suite time
budget and blank the round's CORRECTNESS artifact — this caught-locally gate
exists so that can never happen silently again (CORRECTNESS_r04 post-mortem).
"""
import json, sys, os, time
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

def main(sf_dir, out_dir, budget=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    slowest = (0.0, None)
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = pd.read_parquet(qdir)
            t0 = time.monotonic()
            duck_df = con.execute(sql).fetchdf()
            dt = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if dt > slowest[0]:
            slowest = (dt, name)
        if budget is not None and dt > budget:
            print(f"FAIL {name}: oracle took {dt:.1f}s > budget {budget:.0f}s")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
            n_bad += 1
        elif a == b:
            print(f"ok   {name} ({len(a)} rows, oracle {dt:.2f}s)"); n_ok += 1
        else:
            print(f"FAIL {name}: {len(a)} vs {len(b)} rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at row {i}:\n   spark {x}\n   duck  {y}")
                    break
            n_bad += 1
    if slowest[1] is not None:
        print(f"\nslowest oracle: {slowest[1]} ({slowest[0]:.2f}s)")
    print(f"{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    argv = sys.argv[1:]
    budget = None
    if "--budget" in argv:
        i = argv.index("--budget")
        try:
            budget = float(argv[i + 1])
        except (IndexError, ValueError):
            sys.exit("usage: oracle_check.py <sfDir> <verifyOutDir> [--budget SECONDS]")
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        sys.exit("usage: oracle_check.py <sfDir> <verifyOutDir> [--budget SECONDS]")
    main(argv[0], argv[1], budget)
