#!/bin/bash
# Watch the axon TPU relay and run a command the moment it recovers.
#
# The relay that fronts this environment's single TPU chip has multi-hour
# outages (observed: 5+ h). Measurement work should not busy-wait a session:
# start this watcher in the background and let it fire the serial measurement
# sequence automatically on recovery.
#
#   nohup bash tools/relay_watch.sh /tmp/relay_status.txt \
#       bash tools/r3_kernel_run.sh /tmp/r3run &
#
# Probe = real device enumeration through the relay (jax.devices() with the
# axon platform forced), bounded by `timeout` — a wedged relay hangs RPCs
# rather than refusing them, so an unbounded probe never returns.
STATUS=${1:-/tmp/relay_status.txt}
shift || true
if [ $# -eq 0 ]; then
  set -- true  # no command: just log UP and exit
fi
while true; do
  timeout 240 python -c "
import jax
jax.config.update('jax_platforms','axon,cpu')
import time; t0=time.time()
d=jax.devices()
assert 'axon' in str(d[0]).lower() or 'tpu' in str(d[0]).lower(), d
print('UP', d[0], '%.1fs'%(time.time()-t0), flush=True)
" >> "$STATUS" 2>&1
  if grep -q UP "$STATUS"; then
    echo "RELAY_UP $(date)" >> "$STATUS"
    "$@" >> "$STATUS" 2>&1
    echo "WATCH_CMD_DONE $(date)" >> "$STATUS"
    exit 0
  fi
  echo "down $(date)" >> "$STATUS"
  sleep 120
done
