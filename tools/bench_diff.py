#!/usr/bin/env python3
"""Compare two Bench outputs PER-QUERY (totals vary with host load; the
round-3 "regression" was invisible per-query and huge in totals).

Usage: python3 tools/bench_diff.py old.json new.json [ratio_threshold]

Accepts either the raw one-line {"metric":...} Bench output or a driver
BENCH_r*.json wrapper (whose "tail" holds a suffix of that line).
"""
import json
import re
import sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if "queries" in d:
            return d["queries"]
        raw = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    return {m.group(1): float(m.group(2))
            for m in re.finditer(r'"(q_\w+)":([0-9.]+)', raw)}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    print(f"{len(common)} common queries; overlap sum "
          f"{sum(old[q] for q in common):.1f}s -> "
          f"{sum(new[q] for q in common):.1f}s")
    only_old, only_new = set(old) - set(new), set(new) - set(old)
    if only_old:
        print("dropped:", " ".join(sorted(only_old)))
    if only_new:
        print("added:  ", " ".join(sorted(only_new)))
    flagged = [(new[q] / old[q], q) for q in common
               if new[q] > old[q] * thr and new[q] > 0.3]
    for r, q in sorted(flagged, reverse=True):
        print(f"  {q:30s} {old[q]:7.2f}s -> {new[q]:7.2f}s  x{r:.1f}")
    if not flagged:
        print(f"no query regressed beyond x{thr} (ignoring <0.3s)")


if __name__ == "__main__":
    main()
