#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
over the parquet tables in <sfDir>, load the Spark parquet dump, sort
columns by name, sort rows, compare values. Prints PASS/FAIL per query.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
# bound the session: DuckDB's default memory_limit (~80% of RAM) lets a
# heavy oracle balloon in RAM and then spill its whole working set —
# on the x10 sweep the q97 self-join spilled >75 GB and filled the
# disk. A tight limit makes DuckDB pick spill-friendly plans instead.
con.execute("SET memory_limit='24GB'")
con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata is one file per table; ScaleGen output is a
    # Spark-written DIRECTORY of part files under the same name
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
# optional 3rd arg: regex over query names (local spot-checks / chunked
# runs — one python process per chunk keeps pandas peak memory bounded)
if len(sys.argv) > 3:
    import re
    pat = re.compile(sys.argv[3])
    oracle = {k: v for k, v in oracle.items() if pat.search(k)}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"MISS {name}: no spark output dir"); fails += 1; continue
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    files = glob.glob(os.path.join(spark_path, "*.parquet"))
    spark = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
        if files else pd.DataFrame()
    a, b = canon(duck), canon(spark)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        fails += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fails += 1; continue
    # value compare: exact on object/int, exact bits on float (the point
    # of the decimal-routing discipline is bit equality)
    eq = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            print(f"  WARN {name}.{c}: dtype duck={av.dtype} spark={bv.dtype}"
                  " (driver hash may diverge)")
        try:
            if not av.equals(bv):
                # retry after normalizing dtypes (e.g. int32 vs int64)
                import numpy as np
                if not (av.astype(object).where(pd.notna(av), None).tolist()
                        == bv.astype(object).where(pd.notna(bv), None).tolist()):
                    eq = False
                    diff = [(i, x, y) for i, (x, y) in
                            enumerate(zip(av.tolist(), bv.tolist())) if x != y and not (pd.isna(x) and pd.isna(y))][:3]
                    print(f"  col {c} first diffs: {diff}")
        except Exception as e:
            eq = False; print(f"  col {c} compare error: {e}")
    if eq:
        print(f"PASS {name} ({len(a)} rows)")
    else:
        print(f"FAIL {name}: value mismatch"); fails += 1
sys.exit(1 if fails else 0)
