#!/bin/bash
# Round-4 flagship convergence re-anchor (VERDICT r3 next-step #8): the
# round-3 hardware convergence evidence predates this round's defaults —
# one 12-epoch 512x640 b8 bf16 run on the SHIPPED config re-anchors "the
# fast path trains correctly" after every backward-path change, with the
# JSONL curve committed (docs/convergence_r4.jsonl) and a held-out eval +
# end-to-end int8 accuracy budget (VERDICT #5) chained on the trained
# checkpoint.
#
# Run SERIALLY:  nohup bash tools/r4_converge_run.sh /tmp/r4conv &
set -u
WORK=${1:-/tmp/r4conv}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"   # package imports below resolve via cwd; make the script runnable from anywhere
TREE="$WORK/tree"
CKPT="$WORK/ckpt"
mkdir -p "$WORK"

python - <<EOF
from ircolor_tpu.data.synthetic import make_kaist_tree
import os
if not os.path.isdir("$TREE"):
    # 160 train pairs + 24 held-out test pairs (the round-3 recipe shape)
    make_kaist_tree("$TREE", sets={"set00": {"V000": 160}, "set02": {"V000": 24}},
                    size_hw=(512, 640))
    print("tree built")
EOF

rm -f "$WORK/convergence_r4.jsonl"
timeout 5400 python -m ircolor_tpu train \
  --img-height 512 --img-width 640 --compute-dtype bf16 \
  --batch-size 8 --epochs 12 --lr-decay-start-epoch 8 --save-every 4 \
  --num-workers 8 --train-roots "$TREE/set00" --save-dir "$CKPT" \
  --jsonl-log "$WORK/convergence_r4.jsonl" \
  > "$WORK/train.log" 2>&1
echo "TRAIN_RC=$?" >> "$WORK/train.log"

timeout 2400 python -m ircolor_tpu test \
  --img-height 512 --img-width 640 --compute-dtype bf16 --test-batch-size 8 \
  --test-roots "$TREE/set02" --output-dir "$WORK/eval_float" --topk 5 \
  --test-g-weights "$CKPT/netG_best.pth" \
  > "$WORK/eval.log" 2>&1
echo "EVAL_RC=$?" >> "$WORK/eval.log"

# End-to-end int8 accuracy budget on the SAME trained weights + tree
timeout 2400 python "$REPO/tools/int8budget.py" \
  --weights "$CKPT/netG_best.pth" --tree "$TREE" \
  --height 512 --width 640 --batch 8 --out "$WORK/int8budget" \
  > "$WORK/int8budget.log" 2>&1
echo "INT8_RC=$?" >> "$WORK/int8budget.log"

echo "CONVERGE_ALL_DONE $(date)" >> "$WORK/train.log"
