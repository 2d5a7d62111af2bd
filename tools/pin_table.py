#!/usr/bin/env python3
"""Merge two REPS=3 bench JSON outputs into the BASELINE.md pin table:
per-query MIN across both runs (the pinned regression protocol),
rendered as a two-column markdown table sorted by key.

Usage: pin_table.py runA.json runB.json [...]
"""
import json
import re
import sys


def main() -> None:
    runs = []
    for p in sys.argv[1:]:
        with open(p) as f:
            text = f.read()  # tolerate sbt's [info] prefix
            m = re.search(r"\{.*\}", text, re.DOTALL)
            if m is None:
                sys.exit(f"no JSON object found in {p}")
            runs.append(json.loads(m.group(0))["queries"])
    keys = sorted(set().union(*[set(r) for r in runs]))
    pins = {k: min(r[k] for r in runs if k in r) for k in keys}
    total = sum(pins.values())
    print(f"<!-- {len(keys)} keys, min-across-{len(runs)}-runs total "
          f"{total:.2f} s -->")
    half = (len(keys) + 1) // 2
    left, right = keys[:half], keys[half:]
    print("| query | warm sec | query | warm sec |")
    print("|---|---|---|---|")
    for i in range(half):
        l = f"| {left[i]} | {pins[left[i]]:.2f} |"
        r = (f" {right[i]} | {pins[right[i]]:.2f} |"
             if i < len(right) else "  |  |")
        print(l + r)


if __name__ == "__main__":
    main()
