#!/usr/bin/env python3
"""Merge two same-HEAD Bench artifacts into the committed BENCH_FULL.json.

Per-query MIN across runs (the in-run estimator extended across the
host's documented multi-minute throttle windows — BASELINE.md), medians
taken from the run that won each query's min, chains merged min-wise.
Adds a `note` field recording the merge. Usage:

    python3 tools/merge_bench.py run1.json run2.json BENCH_FULL.json
"""
import json, sys

def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    out_path = sys.argv[3]
    names = sorted(set(a["queries"]) | set(b["queries"]))
    queries, medians = {}, {}
    for n in names:
        ta, tb = a["queries"].get(n, -1.0), b["queries"].get(n, -1.0)
        src = a if (tb < 0 or (0 <= ta <= tb)) else b
        queries[n] = src["queries"][n]
        medians[n] = src.get("medians", {}).get(n, queries[n])
    chains = {}
    for n in set(a.get("chains", {})) | set(b.get("chains", {})):
        vals = [r["chains"][n] for r in (a, b) if n in r.get("chains", {})]
        chains[n] = min(vals)
    failed = max(a.get("failed", 0), b.get("failed", 0))
    total = -1.0 if failed else round(sum(queries.values()), 3)
    merged = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": queries, "medians": medians, "chains": chains,
        "median_ratio_vs_committed": b.get("median_ratio_vs_committed"),
        "uniform_inflation": bool(a.get("uniform_inflation") and
                                  b.get("uniform_inflation")),
        "sf": a.get("sf"), "failed": failed,
        "note": ("per-query min over two same-HEAD 3-pass runs "
                 f"({a.get('value')}s and {b.get('value')}s raw totals); "
                 "medians from each query's winning run"),
    }
    json.dump(merged, open(out_path, "w"), separators=(",", ":"))
    print(f"merged {len(queries)} queries -> {out_path}: total {total}s, "
          f"failed {failed}")

if __name__ == "__main__":
    main()
