#!/usr/bin/env python3
"""Bench gate check: is the sf0.1 board total within 2x of the round-1
yardstick?

Usage: python3 tools/bench_gate.py <bench_json_or_log> [...]

Accepts a BENCH_r*.json driver artifact, a raw `graft.Bench` log (the
JSON line is extracted), or several of either. Exit 0 iff every input's
total is under the gate. Run this after EVERY full bench, in-round —
round 10 shipped a 2.33x board because nothing compared the total to
the gate until the judge did.
"""
import json
import re
import sys

YARDSTICK_SEC = 32.305   # round-1 driver board total (BENCH_r01.json)
GATE = 2.0 * YARDSTICK_SEC


def total_of(path: str):
    text = open(path).read()
    # driver artifact: {"n":..,"tail":"...{json line}..."} or the raw line
    for candidate in (text, *re.findall(r'\{"metric":"total".*', text)):
        try:
            d = json.loads(candidate if candidate.lstrip().startswith("{")
                           else "{" + candidate)
        except json.JSONDecodeError:
            continue
        if "total_sec" in d:
            return float(d["total_sec"]), d.get("n_queries"), d.get("failed")
        if isinstance(d.get("tail"), str):
            m = re.search(r'"total_sec":([0-9.]+)', d["tail"])
            n = re.search(r'"n_queries":(\d+)', d["tail"])
            f = re.search(r'"failed":(\d+)', d["tail"])
            if m:
                return (float(m.group(1)),
                        int(n.group(1)) if n else None,
                        int(f.group(1)) if f else None)
    # last resort: grep the raw text
    m = re.search(r'"total_sec":([0-9.]+)', text)
    if m:
        return float(m.group(1)), None, None
    raise SystemExit(f"{path}: no bench total found")


def main(paths):
    ok = True
    for p in paths:
        total, n, failed = total_of(p)
        ratio = total / YARDSTICK_SEC
        verdict = "PASS" if total <= GATE and not failed else "FAIL"
        if verdict == "FAIL":
            ok = False
        extra = f" n={n}" if n is not None else ""
        extra += f" failed={failed}" if failed else ""
        print(f"{verdict} {p}: {total:.2f}s = {ratio:.2f}x of "
              f"{YARDSTICK_SEC}s (gate {GATE:.2f}s){extra}")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1:]))
