#!/bin/bash
# MFU-push probe matrix (VERDICT round-2 item 4).  Each probe runs in its
# own process because XLA_FLAGS are read once at backend init.  Appends
# one JSON line per probe to results/mfu_push.jsonl.  Run ONLY when no
# other process holds the TPU relay (single-tenant).
set -u
cd "$(dirname "$0")/.."
out=results/mfu_push.jsonl

probe() {  # probe <batch> <bf16_norm> <flags...>
  local batch="$1" norm="$2"; shift 2
  local flags="$*"
  echo "--- batch=$batch bf16_norm=$norm XLA_FLAGS='$flags'" >&2
  XLA_FLAGS="$flags" timeout 900 python scripts/mfu_push.py "$batch" "$norm" >> "$out" 2>/tmp/mfu_probe_err.log \
    || echo "{\"batch\": $batch, \"bf16_norm\": $norm, \"xla_flags\": \"$flags\", \"error\": \"$(tail -1 /tmp/mfu_probe_err.log | tr '\"' ' ' | cut -c1-120)\"}" >> "$out"
}

# baseline reference points (round-2: b8 58%, b16 62.8%)
probe 16 1 ""
probe 32 1 ""
probe 64 1 ""
# latency-hiding scheduler: overlaps HBM prefetch with compute
probe 32 1 "--xla_tpu_enable_latency_hiding_scheduler=true"
# larger scoped vmem: deeper fusion/pipelining headroom for conv+GN chains
probe 32 1 "--xla_tpu_scoped_vmem_limit_kib=98304"
probe 32 1 "--xla_tpu_enable_latency_hiding_scheduler=true --xla_tpu_scoped_vmem_limit_kib=98304"
# async collective/dma aggressiveness
probe 32 1 "--xla_tpu_enable_ici_ooo_collectives=true --xla_tpu_enable_latency_hiding_scheduler=true"
echo "done" >&2
