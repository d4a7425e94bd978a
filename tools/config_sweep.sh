#!/bin/bash
# Config-invariance sweep (round 14, VERDICT r13 #4): re-dump the whole
# query board under shuffle-partition counts {4, 200} × AQE {on, off}
# and oracle-compare every dump. The driver's gate runs one config; a
# query whose result depends on the partition count or on AQE re-planning
# (float-sum reassociation crossing the 9-digit canon, order-dependent
# tie-breaks, nondeterministic sampling) only shows up under a sweep like
# this. PASS = every config's full board is oracle-green.
#
# Round 16 (VERDICT r15 #2): the sweep is self-recording — every run
# appends its per-cell summary block (date, git sha, per-cell pass/fail
# counts) to SWEEPS.md so the evidence can't silently lapse out of the
# repo the way the round-15 PASS did.
#
# Usage: tools/config_sweep.sh [sfDir] [outRoot]
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/config_sweep}
cd "$(dirname "$0")/.."
SHA=$(git rev-parse --short HEAD 2>/dev/null || echo "no-git")
DIRTY=$(git status --porcelain 2>/dev/null | grep -q . && echo "+dirty" || echo "")
LOG=SWEEPS.md
[ -f "$LOG" ] || cat > "$LOG" <<'HDR'
# Config-invariance sweep log

Appended by `tools/config_sweep.sh` on every run (VERDICT r15 #2: the
sweep must be self-recording). Each block: UTC date, git sha at run
time, scale-factor dir, and per-cell oracle pass/fail counts for
shuffle-partitions {4,200} × AQE {on,off}. PASS = all cells fully
oracle-green.
HDR
{
  echo ""
  echo "## $(date -u +%Y-%m-%dT%H:%M:%SZ) @ ${SHA}${DIRTY} — sf=$(basename "$SF")"
  echo ""
} >> "$LOG"
FAIL=0
for cfg in "4 true" "4 false" "200 true" "200 false"; do
  set -- $cfg
  P=$1; A=$2
  DIR="$OUT/p${P}_aqe${A}"
  echo "== shuffle.partitions=$P aqe=$A -> $DIR"
  rm -rf "$DIR"
  # guard under set -e: a verify crash must record a FAIL line and let
  # the remaining configs run, not abort the sweep mid-loop
  if ! SPARK_GRAFT_SHUFFLE_PARTITIONS=$P SPARK_GRAFT_AQE=$A \
      tools/run_verify.sh "$SF" "$DIR" >/dev/null 2>&1; then
    echo "FAIL p=$P aqe=$A (verify crashed)"
    echo "- FAIL p=$P aqe=$A (verify crashed)" >> "$LOG"
    FAIL=1
    continue
  fi
  LINE=$(python3 tools/verify_local.py "$SF" "$DIR" | tail -1)
  echo "$LINE" >&2
  if echo "$LINE" | grep -q " 0 fail"; then
    echo "PASS p=$P aqe=$A"
    echo "- PASS p=$P aqe=$A — $LINE" >> "$LOG"
  else
    echo "FAIL p=$P aqe=$A"
    echo "- FAIL p=$P aqe=$A — $LINE" >> "$LOG"
    FAIL=1
  fi
done
if [ "$FAIL" = 0 ]; then
  echo "" >> "$LOG"; echo "**PASS** (all 4 cells oracle-green)" >> "$LOG"
else
  echo "" >> "$LOG"; echo "**FAIL** (see cells above)" >> "$LOG"
fi
exit $FAIL
