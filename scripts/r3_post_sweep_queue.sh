#!/bin/bash
# Round-3 end-of-round TPU queue (single-tenant relay — run AFTER the
# seed-replication sweep is stopped):
#   1. MFU probe matrix (VERDICT round-2 item 4)
#   2. 3-way ROC on the calibrated diffuse lesion regime (item 5)
#   3. bench.py validation of the promoted headline
set -u
cd "$(dirname "$0")/.."

echo "=== [1/3] MFU probes" >&2
bash scripts/run_mfu_probes.sh

echo "=== [2/3] diffuse 3-way ROC (severity 1.5)" >&2
timeout 2400 python -u -m anoddpm_tpu.detect 256syn64s2d_s0 roc 256syn64s2dg \
    CE=256syn64s2d LESION=diffuse:1.5 > /tmp/roc_diffuse.log 2>&1
cp metrics/roc-comparison.csv results/roc_3way_diffuse_sev1.5.csv 2>/dev/null
cp final-outputs/roc-comparison.png results/roc_3way_diffuse_sev1.5.png 2>/dev/null
tail -5 /tmp/roc_diffuse.log >&2

echo "=== [3/3] bench validation (promoted headline)" >&2
timeout 1200 python bench.py > /tmp/bench_r3_validate.json 2>/tmp/bench_r3_validate.log
cat /tmp/bench_r3_validate.json >&2
echo "queue done" >&2
