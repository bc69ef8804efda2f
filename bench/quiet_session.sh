#!/bin/bash
# Launch-admission wrapper for scaling sessions (BENCH/BASELINE.md
# methodology, round-5): probe the memory-bandwidth instrument every
# 4 min and start a session ONLY when the window is in the quiet band
# (membw_canary >= 9.2 GB/s — the flat 9.3-10.2 GB/s reference profile
# floor from BENCH/membw_sustain.json), then run with the stricter
# per-leg gates.  The admission decision reads only the instrument,
# never a measured efficiency, so pooled pairs stay pre-registered.
# Gives up after ~100 min without a quiet window (exit 2).
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 25); do
  BW=$(python -c "import bench; print(bench.membw_canary())")
  TS=$(date +%H:%M:%S)
  echo "probe $i $TS membw=$BW"
  OK=$(python -c "print(1 if float('$BW') >= 9.2 else 0)")
  if [ "$OK" = "1" ]; then
    echo "quiet window at $TS — launching session"
    python bench/run_scaling.py --docs 600000 --levels 2 8 --repeats 3 \
      --abort-canary 0.75 --abort-membw 8.8
    exit $?
  fi
  sleep 240
done
echo "no quiet window found; giving up"
exit 2
