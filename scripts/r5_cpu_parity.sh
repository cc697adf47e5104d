#!/bin/bash
# Round-5 reference-side parity queue — the PyTorch reference on the single
# host CPU core.  JAX_PLATFORMS=cpu + empty PALLAS_AXON_POOL_IPS so the
# simplex adapter's jitted kernels run on host CPU and never touch the
# single-tenant TPU relay (which the r5_tpu_queue holds).
set -u
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
PROG=results/r5_parity_progress.txt
mark() { echo "$(date +%H:%M:%S) $*" >> "$PROG"; }

mark "=== r5 CPU parity queue start ==="
for job in "reference p32s8 1" "reference p32s8 2" "reference p32s 0"; do
  mark "parity_ref $job start"
  timeout 21600 nice -n 10 python scripts/parity_vs_reference.py $job \
      > "/tmp/r5_parity_ref_$(echo $job | tr ' ' '_').log" 2>&1
  mark "parity_ref $job done rc=$?"
done
mark "aggregate start"
timeout 600 python scripts/parity_vs_reference.py aggregate p32s8 \
    > /tmp/r5_parity_aggregate.log 2>&1
mark "aggregate done rc=$?"
mark "=== r5 CPU parity queue complete ==="
