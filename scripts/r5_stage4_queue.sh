#!/bin/bash
# Round-5 stage-4 TPU queue: causal isolation of the residual p32s8 delta
# (corrected ref .498 vs fw-hash .589).  Two framework twins, 3 seeds each:
#   p32s8t — reference-exact TABLE noise (ops/simplex.py perm_table_pool)
#   p32s8f — fp32 compute dtype (ref torch is fp32 end-to-end)
# Each twin aggregates against p32s8's corrected reference rows
# (_reference_cell).  Run only when stage 3 is done (single-tenant relay).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
PROG=results/r5_queue_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 stage-4 queue start ==="
for cell in p32s8t p32s8f; do
  for seed in 0 1 2; do
    mark "parity_fw framework $cell $seed start"
    timeout 3600 python scripts/parity_vs_reference.py framework $cell $seed \
        > /tmp/r5_parity_fw_${cell}_${seed}.log 2>&1
    mark "parity_fw framework $cell $seed done rc=$?"
  done
done
for cell in p32s8t p32s8f p32s8; do
  timeout 600 python scripts/parity_vs_reference.py aggregate $cell \
      >> /tmp/r5_stage4_aggregate.log 2>&1
done
mark "stage-4 aggregates done"
mark "=== r5 stage-4 queue complete ==="
