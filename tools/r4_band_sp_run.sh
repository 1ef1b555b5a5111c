#!/bin/bash
# Round-4 probe (VERDICT r3 next-step #4): should the XLA small-batch band
# override engage PER-SHARD under spatial sharding?
#
# `test --sp-devices 2` halves the image H per device, so each device's
# in-context shape at 512x640 is exactly a 256x640 full-model run (test-mode
# spatial sharding shards H, not batch). Multi-chip hardware is not
# available here, so the decision data is the fused-vs-XLA A/B AT THE SHARD
# PLANE: if the fused kernels still win at 256x640 in the band (b2-6), the
# `and not sp` exclusion in models/generator.py:_xla_smallbatch_band usage
# leaves that win on the table and should be lifted (halo-exchange cost is
# the remaining margin); if XLA wins at the shard plane, the exclusion is
# confirmed.
#
# Run SERIALLY (one TPU process at a time):
#   nohup bash tools/r4_band_sp_run.sh /tmp/r4band.log &
OUT=${1:-/tmp/r4band.log}
: > "$OUT"
for b in 2 3 4 5 6; do
  echo "=== batch $b, 256x640 shard plane ===" >> "$OUT"
  timeout 1800 python tools/b1bench.py --batch "$b" --height 256 --width 640 \
    --iters 30 --variants "shipped,xla (all fused off),blocks only" \
    >> "$OUT" 2>&1
done
echo "BAND_SP_DONE $(date)" >> "$OUT"
