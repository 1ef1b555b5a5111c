# Round-5 flagship convergence + the int8 accuracy-budget REGRESSION GATE
# (VERDICT r4 #2): one 12-epoch 512x640 b8 bf16 run on the SHIPPED config,
# held-out eval, then tools/int8budget.py with --assert bounds — the
# automated check behind the int8-by-default serving promotion. Artifacts:
#   docs/convergence_r5.jsonl   (training curve)
#   docs/int8_budget_r5.json    (float-vs-int8 deltas + gate verdict)
# Run SERIALLY:  nohup bash tools/r5_converge_run.sh /tmp/r5conv &
set -u
WORK=${1:-/tmp/r5conv}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
TREE="$WORK/tree"
CKPT="$WORK/ckpt"
mkdir -p "$WORK"

python - <<EOF
from ircolor_tpu.data.synthetic import make_kaist_tree
import os
if not os.path.isdir("$TREE"):
    # 160 train pairs + 24 held-out test pairs (the round-3/4 recipe shape)
    make_kaist_tree("$TREE", sets={"set00": {"V000": 160}, "set02": {"V000": 24}},
                    size_hw=(512, 640))
    print("tree built")
EOF

echo "=== train 12 epochs, shipped defaults ===" | tee "$WORK/train.log"
timeout 14400 python -m ircolor_tpu train \
  --img-height 512 --img-width 640 --compute-dtype bf16 --batch-size 8 \
  --epochs 12 --save-every 4 --lr-decay-start-epoch 8 \
  --train-roots "$TREE/set00" --save-dir "$CKPT" \
  --jsonl-log "$WORK/curve.jsonl" >> "$WORK/train.log" 2>&1
echo "TRAIN_RC=$?" | tee -a "$WORK/train.log"
cp "$WORK/curve.jsonl" "$REPO/docs/convergence_r5.jsonl" || true

echo "=== int8 budget gate on the trained ckpt ===" | tee "$WORK/int8.log"
timeout 5400 python tools/int8budget.py \
  --weights "$CKPT/netG_best.pth" --tree "$TREE" \
  --height 512 --width 640 --batch 8 --out "$WORK/int8out" \
  --assert-max-dpsnr 0.02 --assert-max-dssim 0.002 \
  > "$WORK/int8_budget.json.raw" 2> "$WORK/int8.err"
RC=$?
echo "INT8_RC=$RC" | tee -a "$WORK/int8.log"
# Strip the gate-verdict lines so the committed artifact is pure JSON
# (ADVICE r4: the r4 artifact had a trailing shell line).
python - <<EOF
import json
txt = open("$WORK/int8_budget.json.raw").read()
start = txt.index("\n{") + 1  # run_test progress lines precede the JSON
end = txt.rindex("}") + 1
obj = json.loads(txt[start:end])
obj["gate"] = {"max_dpsnr": 0.02, "max_dssim": 0.002,
               "passed": $RC == 0, "rc": $RC}
open("$REPO/docs/int8_budget_r5.json", "w").write(json.dumps(obj, indent=2) + "\n")
print("artifact written, gate passed:", $RC == 0)
EOF
echo DONE
