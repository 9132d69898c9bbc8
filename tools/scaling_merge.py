#!/usr/bin/env python3
"""Merge a SUBSET scaling run into an existing BENCH_SCALING.json decade.

tools/scaling.py rebuilds the whole file from two full Bench summaries;
this tool instead patches per-query rows into one decade section (the
top-level factor10 map or the nested "factor100"), recomputing that
section's median/max/super-linear rollups — used to extend a decade with
newly-gated queries without re-timing the whole suite.

Usage: python3 tools/scaling_merge.py <scaling.json> <decade: top|factor100>
         <small_summary.json> <big_summary.json> <data_factor>
"""
import json
import sys


def main(path, decade, small_p, big_p, factor):
    doc = json.load(open(path))
    sec = doc if decade == "top" else doc[decade]
    small = json.load(open(small_p))
    big = json.load(open(big_p))
    factor = float(factor)
    assert abs(sec["data_factor"] - factor) < 1e-9, \
        f"decade mismatch: {sec['data_factor']} vs {factor}"
    added = []
    for q, tb in sorted(big["queries"].items()):
        ts = small["queries"].get(q)
        if ts is None or ts <= 0:
            continue
        ratio = tb / ts
        sec["queries"][q] = {
            "small_sec": round(ts, 3),
            "big_sec": round(tb, 3),
            "ratio": round(ratio, 2),
            "super_linear": bool(ratio > 1.2 * factor),
        }
        added.append(q)
    rows = sec["queries"]
    ratios = sorted(r["ratio"] for r in rows.values())
    sec["n_queries"] = len(rows)
    sec["median_ratio"] = ratios[len(ratios) // 2] if ratios else None
    sec["max_ratio"] = max(ratios) if ratios else None
    sec["super_linear"] = sorted(
        (q for q, r in rows.items() if r["super_linear"]),
        key=lambda q: -rows[q]["ratio"])
    json.dump(doc, open(path, "w"), indent=1)
    print(f"merged {len(added)} queries into {decade}: {added}; "
          f"median {sec['median_ratio']}x for {factor}x data, "
          f"super-linear: {sec['super_linear']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
