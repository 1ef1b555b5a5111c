#!/bin/bash
# Round-3 run C: the decisive serial pass for the remaining ship decisions.
#   - nb kernel: run A said +0.96 ms in context (NULL), run B said -1.34 ms
#     (WIN) — same-process deltas disagree across runs, so measure twice more.
#   - head kernel: won isolated (6.67 vs 10.74 ms) and in context (-1.54 ms)
#     in run B; needs a confirming sample.
#   - pb_int8 (in-kernel int8 fused block): int8probe confirmed the 2.15x MXU
#     path at 100-iter chains; first in-context measurement here.
# Run SERIALLY on the TPU (CLAUDE.md). Usage: bash tools/r3c_kernel_run.sh [logdir]
set -u
LOG=${1:-/tmp/r3crun}
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

# 1. Hardware parity for the int8 block: compiled-on-TPU vs interpret-mode
#    (the interpret semantics are pinned to the exact fake-quant XLA twin by
#    tests/test_pallas_resblock.py on CPU).
TMO=1800 run int8parity python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas_q
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(1, 32, 160, 256).astype(np.float32) * 0.5).astype(jnp.bfloat16)
k1 = jnp.asarray(rng.randn(3, 3, 256, 256).astype(np.float32) * 0.05).astype(jnp.bfloat16)
k2 = jnp.asarray(rng.randn(3, 3, 256, 256).astype(np.float32) * 0.05).astype(jnp.bfloat16)
for th in (16, 32):
    got = np.asarray(jax.jit(
        lambda x, k1, k2: resnet_block_pallas_q(x, k1, k2, tile_h=th))(x, k1, k2),
        dtype=np.float32)
    want = np.asarray(resnet_block_pallas_q(x, k1, k2, tile_h=th, interpret=True),
                      dtype=np.float32)
    d = np.abs(got - want).max()
    print(f"th={th}: max|tpu - interpret| = {d:.3e}", flush=True)
    assert d <= 3e-2, d
print("INT8 BLOCK TPU PARITY PASS", flush=True)
EOF

# 2. Isolated block sweep at the bottleneck shape: xla vs bf16-fused vs
#    int8-fused (th=16 and 32).
TMO=2400 run blockbench python tools/pallasbench.py \
  --cases "xla resblock,v3 block,int8 block"

# 3. Decisive in-context A/B at 512x640 b16 — all contenders, one process.
TMO=5400 run fwd512c python tools/fwdvariants.py \
  --variants base,pallas_block,pb_normblur,pb_head,pb_nb_head,pb_int8,pb_int8_full

# 4. Stability repeat of the contenders in a fresh process (same-process
#    deltas, second sample — nb flip-flopped between runs A and B).
TMO=4800 run fwd512d python tools/fwdvariants.py \
  --variants pallas_block,pb_normblur,pb_head,pb_nb_head,pb_int8

echo "ALL DONE -> $LOG" | tee -a "$LOG/driver.log"
