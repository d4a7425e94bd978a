#!/bin/bash
# Config-invariance sweep (round 14, VERDICT r13 #4): re-dump the whole
# query board under shuffle-partition counts {4, 200} × AQE {on, off}
# and oracle-compare every dump. The driver's gate runs one config; a
# query whose result depends on the partition count or on AQE re-planning
# (float-sum reassociation crossing the 9-digit canon, order-dependent
# tie-breaks, nondeterministic sampling) only shows up under a sweep like
# this. PASS = every config's full board is oracle-green.
#
# Usage: tools/config_sweep.sh [sfDir] [outRoot]
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/config_sweep}
cd "$(dirname "$0")/.."
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
    FAIL=1
    continue
  fi
  if python3 tools/verify_local.py "$SF" "$DIR" | tail -1 \
      | tee /dev/stderr | grep -q " 0 fail"; then
    echo "PASS p=$P aqe=$A"
  else
    echo "FAIL p=$P aqe=$A"
    FAIL=1
  fi
done
exit $FAIL
