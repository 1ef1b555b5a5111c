# Round-5 serial run B:
# 1. FRESH train-step attribution at the shipped config (VERDICT r4 #3) —
#    the standing "enc/dec bwd ~108 ms" figure predates fused_wg /
#    blur_matmul_bwd / d_concat. Sandwich control around the knockouts.
# 2. Second band-under-sp shard plane (VERDICT r4 #7): sp=4 @512×640 →
#    128×640 per-shard plane, per-shard bottleneck 32×160 = 5120 px —
#    below _SP_BAND_MIN_AREA, so today it falls back to XLA; confirm that
#    fallback is right (or move the gate).
# Run SERIALLY:  nohup bash tools/r5b_train_sp_run.sh /tmp/r5b &
set -u
WORK=${1:-/tmp/r5b}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p "$WORK"

echo "=== trainbench loss-knockout attribution (b8 512x640) ===" | tee "$WORK/train.log"
timeout 7200 python tools/trainbench.py --batch 8 --iters 8 \
  --variants ship,no_perc,no_gan_d,l1_only,ship >> "$WORK/train.log" 2>&1
echo "TRAIN_RC=$?" | tee -a "$WORK/train.log"

echo "=== gradbench G split (b8 512x640) ===" | tee "$WORK/grad.log"
timeout 5400 python tools/gradbench.py --batch 8 \
  --variants g_full,g_noblocks >> "$WORK/grad.log" 2>&1
echo "GRAD_RC=$?" | tee -a "$WORK/grad.log"

echo "=== sp=4 shard-plane band probe (128x640) ===" | tee "$WORK/sp4.log"
for b in 2 4 6; do
  echo "--- batch $b, 128x640 shard plane ---" >> "$WORK/sp4.log"
  timeout 1800 python tools/b1bench.py --batch "$b" --height 128 --width 640 \
    --iters 30 --force \
    --variants "xla (all fused off),blocks only" >> "$WORK/sp4.log" 2>&1
done
echo "SP4_RC=$?" | tee -a "$WORK/sp4.log"
echo DONE
