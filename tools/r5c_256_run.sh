# Round-5 serial run C: give 256² a ceiling (VERDICT r4 #4) — repeat the
# 512×640 methodology at the published-table resolution: in-context
# knockout attribution (IN / pads / full ceiling), small-tile fused-block
# probes below the 12288-px gate, and the metric-tail + full-step split
# that explains the forward-vs-step gap (fwd ~14.6 ms vs step ~25.6 ms at
# b16 — proportionally far larger than 512×640's tail).
# Run SERIALLY:  nohup bash tools/r5c_256_run.sh /tmp/r5c &
set -u
WORK=${1:-/tmp/r5c}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p "$WORK"

echo "=== fwdvariants 256x256 b16: knockouts + small-tile blocks ===" | tee "$WORK/fwd256.log"
timeout 7200 python tools/fwdvariants.py --height 256 --width 256 --batch 16 \
  --variants base,no_in,zero_pads,pb_ceiling,pallas_block,pb_th16,pb_th8,pb_int8_th16,pb_int8_th8,base \
  >> "$WORK/fwd256.log" 2>&1
echo "FWD256_RC=$?" | tee -a "$WORK/fwd256.log"

echo "=== metric tail at 256x256 b16 ===" | tee "$WORK/metric256.log"
timeout 2400 python tools/metricbench.py --height 256 --width 256 --batch 16 \
  >> "$WORK/metric256.log" 2>&1
echo "METRIC_RC=$?" | tee -a "$WORK/metric256.log"

echo "=== full-step vs forward split at 256x256 b16 (b1bench) ===" | tee "$WORK/step256.log"
timeout 2400 python tools/b1bench.py --batch 16 --height 256 --width 256 \
  --iters 30 --variants "shipped,float shipped,shipped (repeat)" \
  >> "$WORK/step256.log" 2>&1
echo "STEP256_RC=$?" | tee -a "$WORK/step256.log"
echo DONE
