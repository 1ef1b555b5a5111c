#!/bin/bash
# Round-3 run E: empirical check of the small-batch band INTERIOR
# (_xla_smallbatch_band engages every fused kernel at 2 <= b <= 7; b2/b4
# were measured, b5-b7 were interpolated) at both resolutions, plus the
# 256^2 band edges. Run SERIALLY on the TPU (CLAUDE.md).
# Usage: bash tools/r3e_band_run.sh [logdir]
set -u
LOG=${1:-/tmp/r3erun}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$LOG/driver.log"
  timeout "$TMO" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -12 "$LOG/$name.log" | tee -a "$LOG/driver.log"
  echo "=== $name rc=$rc ===" | tee -a "$LOG/driver.log"
}

# 1. 512x640 band interior: b5/b6/b7 (b1/b2/b4/b8/b16 already measured).
for B in 5 6 7; do
  TMO=3600 run "band512_b$B" python tools/b1bench.py --batch "$B"
done

# 2. 256^2 band: only b4 was measured (8.2 ms shipped vs 17.7 XLA).
for B in 2 5 7; do
  TMO=3600 run "band256_b$B" python tools/b1bench.py --batch "$B" \
    --height 256 --width 256
done

# 3. Bench refresh on shipped defaults (decision-free, standing last step).
TMO=6000 run bench python bench.py

echo "ALL DONE -> $LOG" | tee -a "$LOG/driver.log"
