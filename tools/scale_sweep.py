#!/usr/bin/env python3
"""Assemble CORRECTNESS_SCALE_x10.json from a check_oracle-style run.

Usage: scale_sweep.py <sfDir> <verifyOutDir> <outJson> <datasetNote>

Runs the same DuckDB compare as check_oracle.py (imported logic kept
inline for the chunked memory profile: one connection, queries in name
order) and writes the per-query pass/rows JSON artifact the round
records. Exits nonzero if any query fails.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir, out_json, note = sys.argv[1:5]

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


results, fails = {}, 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    entry = {"pass": False, "rows": 0}
    try:
        if not os.path.isdir(spark_path):
            raise RuntimeError("no spark output dir")
        duck = con.execute(sql).df()
        files = glob.glob(os.path.join(spark_path, "*.parquet"))
        spark = (pd.concat([pd.read_parquet(f) for f in files],
                           ignore_index=True)
                 if files else pd.DataFrame())
        a, b = canon(duck), canon(spark)
        ok = (list(a.columns) == list(b.columns) and len(a) == len(b))
        if ok:
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.equals(bv):
                    continue
                if (av.astype(object).where(pd.notna(av), None).tolist()
                        != bv.astype(object)
                        .where(pd.notna(bv), None).tolist()):
                    ok = False
                    break
        entry = {"pass": bool(ok), "rows": int(len(a))}
        print(("PASS" if ok else "FAIL"), name, len(a), flush=True)
    except Exception as e:
        entry = {"pass": False, "rows": 0, "error": str(e)[:200]}
        print("FAIL", name, "error:", str(e)[:120], flush=True)
    if not entry["pass"]:
        fails += 1
    results[name] = entry

artifact = {
    "dataset": note,
    "round": 9,
    "subset": "FULL SUITE - every SparkEntry query",
    "results": results,
    "n_pass": sum(1 for r in results.values() if r["pass"]),
    "n_total": len(results),
}
with open(out_json, "w") as f:
    json.dump(artifact, f, indent=1)
print(f"{artifact['n_pass']}/{artifact['n_total']} pass -> {out_json}")
sys.exit(1 if fails else 0)
