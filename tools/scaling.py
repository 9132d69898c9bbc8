#!/usr/bin/env python3
"""Merge two Bench summary files (small SF vs scaled SF) into
BENCH_SCALING.json with per-query time ratios.

Usage: python3 tools/scaling.py <small_summary.json> <big_summary.json> \
         <data_factor> [out.json]

A query is flagged super-linear when its time ratio exceeds
1.2 * data_factor (the near-linear band the plan-shape review predicts;
constant overheads make small-SF times optimistic, so the band is wide).
"""
import json
import sys


def main(small_p, big_p, factor, out_p):
    small = json.load(open(small_p))
    big = json.load(open(big_p))
    factor = float(factor)
    rows = {}
    skipped = []
    for q, tb in sorted(big["queries"].items()):
        ts = small["queries"].get(q)
        if ts is None:
            continue
        if ts <= 0:  # ms-precision floor: can't form a ratio
            skipped.append(q)
            continue
        ratio = tb / ts
        rows[q] = {
            "small_sec": round(ts, 3),
            "big_sec": round(tb, 3),
            "ratio": round(ratio, 2),
            "super_linear": bool(ratio > 1.2 * factor),
        }
    flagged = sorted(
        (q for q, r in rows.items() if r["super_linear"]),
        key=lambda q: -rows[q]["ratio"])
    ratios = sorted(r["ratio"] for r in rows.values())
    med = ratios[len(ratios) // 2] if ratios else None
    out = {
        "data_factor": factor,
        "small_sf": small.get("sf"),
        "big_sf": big.get("sf"),
        "n_queries": len(rows),
        "median_ratio": med,
        "max_ratio": max(ratios) if ratios else None,
        "super_linear": flagged,
        "skipped_zero_time": skipped,
        "queries": rows,
    }
    json.dump(out, open(out_p, "w"), indent=1)
    print(f"{len(rows)} queries, median ratio {med}x for {factor}x data, "
          f"{len(flagged)} super-linear: {flagged}"
          + (f", skipped (0-time small run): {skipped}" if skipped else ""))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         sys.argv[4] if len(sys.argv) > 4 else "BENCH_SCALING.json")
