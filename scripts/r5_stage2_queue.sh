#!/bin/bash
# Round-5 stage-2 TPU queue: the Pallas GroupNorm probe (VERDICT item 9).
# Run ONLY after r5_tpu_queue.sh completes (single-tenant relay).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
PROG=results/r5_queue_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 stage-2 queue start ==="

# [A] train-MFU A/B at the batch-32 sweet spot: fresh baseline row + the
#     pallas_norm row, same session conditions, both into mfu_push.jsonl
for pn in 0 1; do
  mark "mfu pallas_norm=$pn start"
  timeout 3600 python scripts/mfu_push.py 32 1 128 1 none 1 $pn \
      >> results/mfu_push.jsonl 2>/tmp/r5_mfu_pn$pn.log
  mark "mfu pallas_norm=$pn done rc=$?"
done

# [B] inference A/B on the headline detect config (base-64 s2d DDIM-15)
for pn in 0 1; do
  mark "bench_quick pallas_norm=$pn start"
  BENCH_QUICK=1 BENCH_BATCH=32 BENCH_PALLAS_NORM=$pn timeout 3600 \
      python bench.py > /tmp/r5_bench_pn$pn.json 2>/tmp/r5_bench_pn$pn.log
  mark "bench_quick pallas_norm=$pn done rc=$? $(cat /tmp/r5_bench_pn$pn.json 2>/dev/null | head -c 200)"
done

mark "=== r5 stage-2 queue complete ==="
