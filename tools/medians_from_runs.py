#!/usr/bin/env python3
"""Regenerate MEDIANS.json from N full-suite bench runs (§17 protocol).

Usage: medians_from_runs.py <meta-note> <run1.json> [run2.json ...]

Each run JSON is a Bench stdout artifact (first line = the full
per-query object). The output median for each query is the median of
its per-run values (each itself an in-run 3-run median). Queries
present in only some runs take the median of what exists. Writes
MEDIANS.json in cwd with a _meta block recording the runs' totals and
load windows.
"""
import json
import statistics
import sys

note = sys.argv[1]
runs = []
for p in sys.argv[2:]:
    with open(p) as f:
        runs.append(json.loads(f.readline()))

names = sorted({k for r in runs for k in r["queries"]})
out = {}
for n in names:
    vals = [r["queries"][n] for r in runs if n in r["queries"]]
    out[n] = round(statistics.median(vals), 4)

meta = {
    "protocol": "full-suite 3-run medians, median across "
                f"{len(runs)} fresh-JVM runs",
    "note": note,
    "runs": [
        {
            "total_sec": round(r["value"], 1),
            "load_start": r.get("load_start"),
            "load_end": r.get("load_end"),
            "median_ratio_vs_prior_record": r.get("median_ratio"),
            "n_queries": len(r["queries"]),
        }
        for r in runs
    ],
    "sf": runs[0].get("sf"),
}
result = {"_meta": meta}
result.update(out)
with open("MEDIANS.json", "w") as f:
    json.dump(result, f, indent=1)
print(f"wrote MEDIANS.json: {len(out)} queries, "
      f"totals={[m['total_sec'] for m in meta['runs']]}")
