#!/bin/bash
# Round-5 stage-6 RESUME: the original stage-6 queue died with seed 0 done
# and seed 1 mid-train.  Re-run p32st seeds 1 and 2 and re-aggregate after
# each, so whatever finishes before the round's wall-clock is recorded.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
PROG=results/r5_queue_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 stage-6 RESUME (seeds 1-2) ==="
for seed in 1 2; do
  mark "parity_fw framework p32st $seed start"
  timeout 3600 python scripts/parity_vs_reference.py framework p32st $seed \
      > /tmp/r5_parity_fw_p32st_$seed.log 2>&1
  mark "parity_fw framework p32st $seed done rc=$?"
  timeout 600 python scripts/parity_vs_reference.py aggregate p32st \
      >> /tmp/r5_stage6_aggregate.log 2>&1
done
mark "=== r5 stage-6 RESUME complete ==="
