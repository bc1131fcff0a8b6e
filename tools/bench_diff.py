#!/usr/bin/env python3
"""Round-over-round bench diff artifact (round-7 verdict item 7): the judge
had to reconstruct the 91-query r6-vs-r7 comparison from verdict text because
artifacts/ only kept current-round bench files. This emits a per-query
best-time delta between two bench JSONs (the `runs` map when present, else
the `queries` map) so every round closes with a machine-readable diff.

Usage: python3 tools/bench_diff.py <prev_bench.json> <cur_bench.json> <out.json>
"""
import json
import sys


def best_times(path):
    with open(path) as f:
        d = json.load(f)
    runs = d.get("runs") or {}
    out = {}
    for q, v in (d.get("queries") or {}).items():
        r = runs.get(q)
        out[q] = min(r) if isinstance(r, list) and r else v
    return out, d


def main():
    prev_path, cur_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    prev, dprev = best_times(prev_path)
    cur, dcur = best_times(cur_path)
    shared = sorted(set(prev) & set(cur))
    diff = {
        "prev": prev_path,
        "cur": cur_path,
        "n_prev": len(prev),
        "n_cur": len(cur),
        "n_shared": len(shared),
        "added": sorted(set(cur) - set(prev)),
        "removed": sorted(set(prev) - set(cur)),
        "shared_total_prev_sec": round(sum(prev[q] for q in shared), 4),
        "shared_total_cur_sec": round(sum(cur[q] for q in shared), 4),
        "queries": {
            q: {
                "prev_sec": round(prev[q], 4),
                "cur_sec": round(cur[q], 4),
                "delta_sec": round(cur[q] - prev[q], 4),
                "ratio": round(cur[q] / prev[q], 3) if prev[q] > 0 else None,
            }
            for q in shared
        },
    }
    regressed = sorted(
        (q for q in shared if prev[q] > 0 and cur[q] / prev[q] > 1.5),
        key=lambda q: -(cur[q] / prev[q]))
    diff["regressed_over_1_5x"] = regressed
    with open(out_path, "w") as f:
        json.dump(diff, f, indent=1, sort_keys=False)
    print(f"wrote {out_path}: shared {len(shared)} "
          f"{diff['shared_total_prev_sec']}s -> {diff['shared_total_cur_sec']}s, "
          f"{len(regressed)} regressed >1.5x")


if __name__ == "__main__":
    main()
