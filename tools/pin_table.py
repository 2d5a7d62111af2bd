#!/usr/bin/env python3
"""Merge two REPS=3 bench JSON outputs into the BASELINE.md pin table:
per-query MIN across both runs (the pinned regression protocol),
rendered as a two-column markdown table sorted by key.

Usage: pin_table.py runA.json runB.json [...]
"""
import json
import sys


def load_bench(path):
    """Find the graft.Bench output line (possibly prefixed by sbt's
    [info]) and parse its JSON; a per-line scan keyed on the contract's
    own fields, so stray braces elsewhere in a log can't mislead it."""
    for line in open(path):
        if '"queries"' not in line:
            continue
        try:
            obj = json.loads(line[line.index("{"):line.rindex("}") + 1])
        except (ValueError, IndexError):
            continue
        if "queries" in obj:
            return obj["queries"]
    sys.exit(f"no bench JSON line with a 'queries' field found in {path}")


def main() -> None:
    runs = []
    for p in sys.argv[1:]:
        runs.append(load_bench(p))
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
