#!/bin/bash
# Round-5 stage-5 TPU queue (single-tenant relay — exclusive chip):
#   1. stage-4 causal-isolation twins (p32s8t table-noise, p32s8f fp32),
#      3 seeds each, framework side only (_reference_cell -> p32s8)
#   2. fw p32s replicate seeds 1-2 (full-budget simplex cell, item 1)
#   3. full-set dense lambda sweep, 22 volumes at STEP=25 (item 5)
#   4. aggregates for every touched cell
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
PROG=results/r5_queue_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 stage-5 queue start ==="
for cell in p32s8t p32s8f; do
  for seed in 0 1 2; do
    mark "parity_fw framework $cell $seed start"
    timeout 3600 python scripts/parity_vs_reference.py framework $cell $seed \
        > /tmp/r5_parity_fw_${cell}_${seed}.log 2>&1
    mark "parity_fw framework $cell $seed done rc=$?"
  done
done

for seed in 1 2; do
  mark "parity_fw framework p32s $seed start"
  timeout 3600 python scripts/parity_vs_reference.py framework p32s $seed \
      > /tmp/r5_parity_fw_p32s_$seed.log 2>&1
  mark "parity_fw framework p32s $seed done rc=$?"
done

mark "dense_sweep_campaign start"
timeout 10800 python scripts/dense_sweep_campaign.py 25 22 \
    > /tmp/r5_dense_sweep.log 2>&1
mark "dense_sweep_campaign done rc=$?"

for cell in p32s8t p32s8f p32s8 p32s; do
  timeout 600 python scripts/parity_vs_reference.py aggregate $cell \
      >> /tmp/r5_stage5_aggregate.log 2>&1
done
mark "stage-5 aggregates done"
mark "=== r5 stage-5 queue complete ==="
