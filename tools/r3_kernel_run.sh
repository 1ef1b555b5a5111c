#!/bin/bash
# Round-3 fused-kernel ship-decision sequence (run SERIALLY on the TPU —
# two processes through the axon relay corrupt measurements, CLAUDE.md).
# Usage: bash tools/r3_kernel_run.sh [logdir]
set -u
LOG=${1:-/tmp/r3run}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$LOG/driver.log"
  timeout "$TMO" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -25 "$LOG/$name.log" | tee -a "$LOG/driver.log"
  echo "=== $name rc=$rc ===" | tee -a "$LOG/driver.log"
}

# 1. Tiny-shape compile+parity gate for every kernel (incl. conv7x7_head).
TMO=1800 run smoke python tools/pallassmoke.py

# 2. Isolated head-kernel sweep at the full-res shape (XLA baseline + th 16/32).
TMO=2400 run headbench python tools/pallasbench.py --cases "head"

# 3. In-context forward A/B at 512x640 b16 (same-process deltas decide).
#    int8 rides along: the quantized-serving candidate vs the fused kernels.
TMO=4800 run fwd512 python tools/fwdvariants.py \
  --variants base,pallas_block,pb_normblur,pb_head,pb_nb_head,int8,int8_head

# 4. Same at 256^2 (area-gate calibration).
TMO=4800 run fwd256 python tools/fwdvariants.py --height 256 --width 256 \
  --variants base,pallas_block,pb_normblur,pb_head,pb_nb_head,int8,int8_head

# 5. Train-step A/B at b8 512x640.
TMO=5400 run train512 python tools/trainbench.py \
  --variants ship,nb_train,head_train,all_fused

# 6. int8 MXU capability probe (matmul + bottleneck conv): decides whether
#    a quantized inference mode is worth building (2x TOPS if the int8
#    path is real; closes the question if it lowers slow).
TMO=2400 run int8probe python tools/int8probe.py

# 7. Decision-free headline refresh with the SHIPPED defaults (512x640 +
#    256^2 aux + train field) — lands the driver metric even if the ship
#    decisions above wait for analysis.
TMO=5400 run bench python bench.py

echo "ALL DONE -> $LOG" | tee -a "$LOG/driver.log"
