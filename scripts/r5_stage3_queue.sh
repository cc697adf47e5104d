#!/bin/bash
# Round-5 stage-3 TPU queue (single-tenant relay — run only when stage 2 is
# done): trustworthy headline bench (VERDICT item 3), fw p32s replicate
# seeds (item 1 support), and the full-set dense lambda sweep (item 5).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
PROG=results/r5_queue_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 stage-3 queue start ==="

mark "bench full n=5 start"
timeout 3600 python bench.py > results/bench_r5a.json 2>/tmp/r5_bench_full.log
mark "bench full n=5 done rc=$? $(head -c 200 results/bench_r5a.json)"

for seed in 1 2; do
  mark "parity_fw framework p32s $seed start"
  timeout 3600 python scripts/parity_vs_reference.py framework p32s $seed \
      > /tmp/r5_parity_fw_p32s_$seed.log 2>&1
  mark "parity_fw framework p32s $seed done rc=$?"
done

mark "dense_sweep_campaign start"
timeout 7200 python scripts/dense_sweep_campaign.py 25 22 \
    > /tmp/r5_dense_sweep.log 2>&1
mark "dense_sweep_campaign done rc=$?"

mark "=== r5 stage-3 queue complete ==="
