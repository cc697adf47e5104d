#!/bin/bash
# Round-5 serial TPU job queue (the relay is single-tenant: one TPU process
# at a time).  Stages ordered by VERDICT priority: parity cells (item 1)
# first, then the bench re-measure (items 3/7), then the flagship 3000-epoch
# campaign (item 2), then the dense sweep (item 5).
# Each stage logs to /tmp/r5_<stage>.log; progress markers to
# results/r5_queue_progress.txt.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
PROG=results/r5_queue_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 TPU queue start ==="

# [0] chain-FLOPs accounting for the ceiling proof (compile-only, fast)
mark "chain_flops start"
timeout 1800 python scripts/chain_flops.py > /tmp/r5_chain_flops.log 2>&1
mark "chain_flops done rc=$?"

# [1] framework-side parity cells (VERDICT item 1): p32s8 seeds 1,2 then
#     the FULL p32s cell (40 epochs, 22 volumes)
for job in "framework p32s8 1" "framework p32s8 2" "framework p32s 0"; do
  mark "parity_fw $job start"
  timeout 10800 python scripts/parity_vs_reference.py $job \
      > "/tmp/r5_parity_fw_$(echo $job | tr ' ' '_').log" 2>&1
  mark "parity_fw $job done rc=$?"
done

# [2] substep-fusion probe for the flagship trainer, then pick the winner
mark "substep_probe start"
timeout 5400 python scripts/substep_probe.py 4 8 16 \
    > /tmp/r5_substep_probe.log 2>&1
mark "substep_probe done rc=$?"
WINNER=$(python - <<'EOF'
import json
best, s = 1e9, 4
try:
    for line in open("results/substep_probe.jsonl"):
        r = json.loads(line)
        if r.get("sec_per_epoch", 1e9) < best:
            best, s = r["sec_per_epoch"], r["substeps"]
except FileNotFoundError:
    pass
print(s)
EOF
)
mark "substep winner: $WINNER"

# [3] full bench with the new spread fields + shared-accounting train line
mark "bench start"
timeout 7200 python bench.py > /tmp/r5_bench_a.json 2>/tmp/r5_bench_a.log
mark "bench done rc=$?"
cp /tmp/r5_bench_a.json results/bench_r5a.json 2>/dev/null

# [4] flagship slice 1: -> 1500 epochs, both headline protocols + testing
mark "flagship_1500 start"
FLAGSHIP_SUBSTEPS=$WINNER timeout 28800 python scripts/flagship_campaign.py \
    1500 --skip-figures > /tmp/r5_flagship_1500.log 2>&1
mark "flagship_1500 done rc=$?"

# [5] flagship slice 2: -> 3000 epochs, full eval + testing + fresh figures
#     (clear the round-4 figures marker so the 3000-epoch checkpoint
#     regenerates the committed figure sheets)
python - <<'EOF'
import json, os
p = "results/flagship_quality.json"
if os.path.exists(p):
    d = json.load(open(p)); d.pop("figures_done", None)
    json.dump(d, open(p, "w"), indent=1, sort_keys=True)
EOF
mark "flagship_3000 start"
FLAGSHIP_SUBSTEPS=$WINNER timeout 28800 python scripts/flagship_campaign.py \
    3000 > /tmp/r5_flagship_3000.log 2>&1
mark "flagship_3000 done rc=$?"

# [6] dense lambda sweep over the FULL anomalous set (VERDICT item 5):
#     train the production base-64 s2d checkpoint, then graph_data STEP=25
#     over all 22 volumes (documented grid; the step-1 full-dense single-
#     volume evidence is round 4's metrics/ARGS=256syn64s2d_bf16n_s1)
mark "dense_train start"
timeout 14400 python -m anoddpm_tpu.train 256syn64s2d \
    > /tmp/r5_dense_train.log 2>&1
mark "dense_train done rc=$?"
mark "dense_sweep start"
timeout 14400 python -m anoddpm_tpu.detect 256syn64s2d graph DENSE STEP=25 \
    > /tmp/r5_dense_sweep.log 2>&1
mark "dense_sweep done rc=$?"

mark "=== r5 TPU queue complete ==="
