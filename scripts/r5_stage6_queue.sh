#!/bin/bash
# Round-5 stage-6 TPU queue: waits for stage 5 (single-tenant relay), then
# runs the FULL-BUDGET table-noise twin p32st (40 epochs, 3 seeds,
# framework side, _reference_cell -> p32s) and re-aggregates everything.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
PROG=results/r5_queue_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

while ! grep -q "r5 stage-5 queue complete" "$PROG"; do sleep 120; done

mark "=== r5 stage-6 queue start ==="
for seed in 0 1 2; do
  mark "parity_fw framework p32st $seed start"
  timeout 3600 python scripts/parity_vs_reference.py framework p32st $seed \
      > /tmp/r5_parity_fw_p32st_$seed.log 2>&1
  mark "parity_fw framework p32st $seed done rc=$?"
  timeout 600 python scripts/parity_vs_reference.py aggregate p32st \
      >> /tmp/r5_stage6_aggregate.log 2>&1
done
mark "=== r5 stage-6 queue complete ==="
