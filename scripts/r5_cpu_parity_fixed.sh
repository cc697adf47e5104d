#!/bin/bash
# Round-5 CORRECTED reference-side parity queue.
#
# Round 4/5's SimplexAdapter divided the gradient row index by 3
# (parity_vs_reference.py round-4 line: `self._gid = pgi // 3`), collapsing
# the reference side's simplex gradients to rows 0..7 of 24 — every
# reference simplex parity row (p32s8 seeds 0-2, p32s) trained AND detected
# with biased noise.  The adapter is fixed (verified vs the reference
# scalar kernel); this queue purges the contaminated reference checkpoints
# and re-runs every reference simplex cell, then re-aggregates.
#
# CPU-pinned: JAX_PLATFORMS=cpu + empty PALLAS_AXON_POOL_IPS so the
# adapter's jitted kernels never touch the single-tenant TPU relay.
set -u
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
PROG=results/r5_parity_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 CORRECTED CPU parity queue start ==="

# purge reference-side artifacts contaminated by the gid//3 adapter bug
for arg in 9338 9338_s1 9338_s2 9332; do
  rm -rf "results/parity_run/ARGS=${arg}/model/diff-params-ARGS=${arg}"
  rm -f  "results/parity_run/ARGS=${arg}/metrics/args${arg}.csv"
done
mark "purged contaminated reference checkpoints"

for job in "reference p32s8 0" "reference p32s8 1" "reference p32s8 2" \
           "reference p32s 0"; do
  mark "parity_ref_fixed $job start"
  timeout 21600 nice -n 10 python scripts/parity_vs_reference.py $job \
      > "/tmp/r5fix_$(echo $job | tr ' ' '_').log" 2>&1
  mark "parity_ref_fixed $job done rc=$?"
done

# fixed-noise map equivalence against the retrained reference checkpoint
mark "maps p32s8 start"
timeout 7200 python scripts/parity_vs_reference.py maps p32s8 \
    > /tmp/r5fix_maps_p32s8.log 2>&1
mark "maps p32s8 done rc=$?"

mark "aggregate start"
timeout 600 python scripts/parity_vs_reference.py aggregate p32s8 \
    > /tmp/r5fix_aggregate.log 2>&1
timeout 600 python scripts/parity_vs_reference.py aggregate p32s \
    >> /tmp/r5fix_aggregate.log 2>&1
mark "aggregate done rc=$?"
mark "=== r5 CORRECTED CPU parity queue complete ==="
