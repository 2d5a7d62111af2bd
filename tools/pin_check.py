#!/usr/bin/env python3
"""Diff a bench JSON (graft.Bench output, REPS=3 warm min-of-3) against
the BASELINE.md pin table and report movers.

The regression rule (BASELINE.md): a query regresses only if its
min-of-3 exceeds its pin by >30% (beyond protocol noise) AND by more
than --min-abs seconds absolute (default 0.25 s — the measured noise
floor of min-of-2-quiet-run pins: sub-second keys swing >30% between
two quiet runs in both directions, so a pure ratio band flags a 6-15
key tail on ANY healthy run and the exit code stops meaning anything).
Keys missing from the table are listed as unpinned; keys missing from
the run as retired. Sub-floor ratio exceedances are reported as
"noise" lines but do not fail the check.

Usage: pin_check.py BENCH.json [BASELINE.md] [--band 0.30] [--min-abs 0.25]
Exit code 1 if any mover exceeds BOTH the band and the absolute floor.
"""
import json
import re
import sys


def load_bench(path):
    """Find the graft.Bench output line (possibly prefixed by sbt's
    [info]) and parse its JSON; a per-line scan keyed on the contract's
    own fields, so stray braces elsewhere in a log can't mislead it.

    Accepts the raw Bench/sbt log AND the driver's BENCH_rNN.json
    wrapper ({"tail": "<escaped log>", ...}): when the whole file
    parses as a JSON object carrying a string "tail", the scan runs
    over the unescaped tail's lines — the wrapper keeps only the last
    chunk of stdout, which is exactly why Bench emits the compact
    one-line artifact last."""
    text = open(path).read()
    try:
        whole = json.loads(text)
        if isinstance(whole, dict) and isinstance(whole.get("tail"), str):
            text = whole["tail"]
        elif isinstance(whole, dict) and "queries" in whole:
            return whole["queries"], whole.get("class_totals", {})
    except ValueError:
        pass
    for line in text.splitlines():
        if '"queries"' not in line:
            continue
        try:
            obj = json.loads(line[line.index("{"):line.rindex("}") + 1])
        except (ValueError, IndexError):
            continue
        if "queries" in obj:
            return obj["queries"], obj.get("class_totals", {})
    sys.exit(f"no bench JSON line with a 'queries' field found in {path}")


def load_pins(path):
    """Parse every `| key | sec |`-shaped cell pair from markdown table
    rows; later tables override earlier ones (the newest pin wins).
    Rows shaped `| class:probe | sec |` pin a PRICING-CLASS total
    (the Bench line's class_totals field) instead of a query."""
    pins, class_pins = {}, {}
    row = re.compile(r"\|\s*([pq]\d+\w*)\s*\|\s*(\d+\.\d+)\s*")
    crow = re.compile(r"\|\s*class:(\w+)\s*\|\s*(\d+\.\d+)\s*")
    for line in open(path):
        for m in row.finditer(line):
            pins[m.group(1)] = float(m.group(2))
        for m in crow.finditer(line):
            class_pins[m.group(1)] = float(m.group(2))
    return pins, class_pins


def main():
    # argparse so every flag spelling works ('--band 0.3' AND
    # '--band=0.3') and an unrecognized '--flag' is an error instead of
    # being silently dropped onto the default
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bench", help="bench JSON/log file (graft.Bench output)")
    ap.add_argument("baseline", nargs="?", default="BASELINE.md",
                    help="pin table markdown (default: BASELINE.md)")
    ap.add_argument("--band", type=float, default=0.30,
                    help="regression band as a fraction (default: 0.30)")
    ap.add_argument("--min-abs", type=float, default=0.25,
                    help="absolute-delta floor in seconds: ratio "
                         "exceedances below it are noise, not movers "
                         "(default: 0.25)")
    ns = ap.parse_args()
    band = ns.band
    bench, class_totals = load_bench(ns.bench)
    pins, class_pins = load_pins(ns.baseline)
    # pricing-class totals: the like-for-like view of the single-pass
    # total (class drift is informative per class; a class total over
    # the band against its class pin counts as a mover like any key,
    # under the same absolute floor that keeps sub-noise ratio
    # exceedances from failing the run)
    movers, noise, checked = [], [], 0
    for c in sorted(set(class_totals) | set(class_pins)):
        tot, pin = class_totals.get(c), class_pins.get(c)
        if tot is None:
            print(f"retired class:{c} (pinned {pin:.2f}, absent from run "
                  "— did Bench stop emitting class_totals?)")
        elif pin is None:
            print(f"class {c}: {tot:.2f} s (unpinned)")
        else:
            over = tot > pin * (1 + band) and tot - pin > ns.min_abs
            flag = "MOVER" if over else "ok"
            print(f"class {c}: {pin:.2f} -> {tot:.2f} ({tot / pin:.2f}x, {flag})")
            if over:
                movers.append((tot / pin, f"class:{c}", pin, tot))
    for k, pin in sorted(pins.items()):
        if k not in bench:
            print(f"retired {k} (pinned {pin:.2f}, absent from run)")
            continue
        checked += 1
        got = bench[k]
        if got > pin * (1 + band):
            if got - pin > ns.min_abs:
                movers.append((got / pin, k, pin, got))
            else:
                noise.append((got / pin, k, pin, got))
    for r, k, pin, got in sorted(movers, reverse=True):
        print(f"MOVER {k}: {pin:.2f} -> {got:.2f} ({r:.2f}x)")
    for r, k, pin, got in sorted(noise, reverse=True):
        print(f"noise {k}: {pin:.2f} -> {got:.2f} ({r:.2f}x, "
              f"+{got - pin:.2f}s < {ns.min_abs:.2f}s floor)")
    unpinned = sorted(set(bench) - set(pins))
    for k in unpinned:
        print(f"unpinned {k} ({bench[k]:.2f} s)")
    print(f"== {checked} pinned keys checked, {len(movers)} over the "
          f"{int(band*100)}% band past the {ns.min_abs:.2f}s floor, "
          f"{len(noise)} sub-floor noise, {len(unpinned)} unpinned ==")
    sys.exit(1 if movers else 0)


if __name__ == "__main__":
    main()
