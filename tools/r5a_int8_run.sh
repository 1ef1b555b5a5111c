# Round-5 serial run A: int8 coverage sweep (VERDICT r4 #1).
# 1. pallassmoke — the new conv7x7_head_q case must pass on hardware.
# 2. fwdvariants at the b32 headline batch: per-site XLA QuantConv re-probes
#    (dynamic + fixed-scale), the int8 fused head, and the everything-int8
#    candidate, all against the shipped int8_nbh serving combo.
# Run SERIALLY:  nohup bash tools/r5a_int8_run.sh /tmp/r5a &
set -u
WORK=${1:-/tmp/r5a}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p "$WORK"

echo "=== pallassmoke ===" | tee "$WORK/smoke.log"
timeout 2400 python tools/pallassmoke.py >> "$WORK/smoke.log" 2>&1
echo "SMOKE_RC=$?" | tee -a "$WORK/smoke.log"

echo "=== fwdvariants b32 int8 sweep ===" | tee "$WORK/fwd.log"
timeout 5400 python tools/fwdvariants.py --batch 32 --variants \
int8_nbh,int8_nbh_hq,int8_qc_d1,int8_qc_d2,int8_qc_u1,int8_qc_u2,int8_qcf_d1,int8_qcf_d2,int8_qcf_u2,int8_qcf_du,int8_full5,int8_nbh \
  >> "$WORK/fwd.log" 2>&1
echo "FWD_RC=$?" | tee -a "$WORK/fwd.log"
echo DONE
