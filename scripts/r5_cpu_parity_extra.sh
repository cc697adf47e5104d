#!/bin/bash
# Round-5 follow-on CPU queue: waits for the corrected parity queue
# (r5_cpu_parity_fixed.sh) to finish, then adds reference p32s seeds 1-2 so
# the full-budget simplex cell is n=3 per side (fw seeds 1-2 run on-chip in
# the stage-5 queue), and re-aggregates.  CPU-pinned like its predecessor.
set -u
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
PROG=results/r5_parity_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

if [ -f /tmp/r5_cpu_queue.pid ]; then
  while kill -0 "$(cat /tmp/r5_cpu_queue.pid)" 2>/dev/null; do sleep 60; done
fi

mark "=== r5 extra CPU parity queue start (p32s ref seeds 1-2) ==="
for seed in 1 2; do
  mark "parity_ref_fixed reference p32s $seed start"
  timeout 21600 nice -n 10 python scripts/parity_vs_reference.py \
      reference p32s $seed > /tmp/r5fix_reference_p32s_$seed.log 2>&1
  mark "parity_ref_fixed reference p32s $seed done rc=$?"
  timeout 600 python scripts/parity_vs_reference.py aggregate p32s \
      >> /tmp/r5fix_aggregate.log 2>&1
done
mark "=== r5 extra CPU parity queue complete ==="
