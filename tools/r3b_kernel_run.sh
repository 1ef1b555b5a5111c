#!/bin/bash
# Round-3 follow-up: re-measure the two kernels that failed remote lowering
# in the first serial run (norm_relu_blur_down: strided-slice gather;
# conv7x7_head: negative-index dynamic_slice — both fixed, see
# tests/test_pallas_lowering.py). Run SERIALLY on the TPU (CLAUDE.md).
# Usage: bash tools/r3b_kernel_run.sh [logdir]
set -u
LOG=${1:-/tmp/r3brun}
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

# 1. Compile+parity gate for the fixed kernels (tiny shapes).
TMO=1800 run smoke python tools/pallassmoke.py

# 2. Isolated head-kernel sweep at the full-res shape.
TMO=2400 run headbench python tools/pallasbench.py --cases "head"

# 3. In-context forward A/B at 512x640 b16: the fixed nb/head kernels
#    against the shipped fused-block config.
TMO=4800 run fwd512 python tools/fwdvariants.py \
  --variants base,pallas_block,pb_normblur,pb_head,pb_nb_head

# 4. Train-step A/B at b8 512x640 for the differentiable wrappers.
TMO=5400 run train512 python tools/trainbench.py \
  --variants ship,nb_train,head_train,all_fused

# 5. int8 probe re-run with enough in-chain iterations for the signal to
#    clear the relay's dispatch noise: the first run's 10-iter chains gave
#    a NEGATIVE int8 matmul time and 3983 TOP/s conv (spec is 394) — the
#    r2-minus-r1 wall difference was all noise for sub-ms ops.
TMO=3600 run int8probe python tools/int8probe.py --iters 100

# 6. Eval e2e stage attribution at 256^2 (VERDICT r2 #4): the runner's
#    pipeline-wait line (decode | h2d+dispatch | d2h | consume | writes)
#    says which host stage binds the 29-vs-620-fps gap.
TMO=3600 run evale2e python - <<'EOF'
from ircolor_tpu.data.synthetic import make_kaist_tree
make_kaist_tree("/tmp/e2etree", {"set02": {"V000": 512}}, size_hw=(256, 256))
import sys
from ircolor_tpu.cli import main
sys.argv = ["ircolor", "test", "--img-size", "256", "--test-batch-size", "16",
            "--test-roots", "/tmp/e2etree/set02", "--output-dir", "/tmp/e2eout",
            "--topk", "5"]
main()
EOF

echo "ALL DONE -> $LOG" | tee -a "$LOG/driver.log"
