#!/bin/bash
# Induced-CPU-load generator for fan-vs-nofan A/B measurements
# (r16 verdict #3/#4): the r16 fan keep/revert calls were made in quiet
# windows, but the failure mode under adjudication only appears when
# the machine is contended — N busy-loop processes emulate the hot
# driver window deterministically. Usage: tools/load.sh [N] [seconds]
# Stop early with: pkill -f GRAFT_SPIN
N=${1:-16}
DUR=${2:-900}
for _ in $(seq "$N"); do
  timeout "$DUR" bash -c ': GRAFT_SPIN; while :; do :; done' &
done
echo "spawned $N spinners for ${DUR}s (pkill -f GRAFT_SPIN to stop)"
