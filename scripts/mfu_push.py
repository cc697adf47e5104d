"""Train-MFU push probes (VERDICT round-2 item 4): measure the fused
multi-substep train step at a given batch size / norm path / XLA flag set
and print one JSON line.  The levers under test:

  - batch size (8 -> 64): deeper MXU tiles amortise the fixed GN-statistics
    and layout-copy traffic the round-2 trace blames for ~26% of step time
  - bf16_norm (GroupNorm elementwise math in bf16; round-2 A/B'd at quality
    parity)
  - XLA_FLAGS (set by the caller; e.g. latency-hiding scheduler)
  - remat policy (round-4: "dots"/"nothing" trade recompute FLOPs for HBM,
    unlocking batch sizes between the 32-ok / 64-OOM points)
  - scan unroll of the fused substeps (round-4: cross-step scheduling
    freedom for XLA)

  - pallas_norm (round-5, VERDICT item 9): fused single-pass Pallas
    GroupNorm+SiLU on eligible shapes (ops/pallas_norm.py)

Run each config in its own process (XLA flags are read at backend init):
  python scripts/mfu_push.py <batch> [bf16_norm=1] [base=128] [s2d=1] \
      [remat=none|dots|nothing] [unroll=1] [pallas_norm=0]
Results are appended to results/mfu_push.jsonl by the caller.

Note on MFU accounting under remat: `flops` comes from cost_analysis of the
compiled SINGLE-step program at the same remat policy, so recompute FLOPs
count toward the numerator — mfu here measures MXU occupancy, while
imgs_per_sec remains the end-metric that must improve for a lever to win.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.ops.noise import make_noise_sampler
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import (init_train_state, make_multi_step,
                                  make_optimizer, make_train_step)

BF16_PEAK_TFLOPS = 197.0  # v5e


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bf16_norm = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    base = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    s2d = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    remat = sys.argv[5] if len(sys.argv) > 5 else "none"
    remat = None if remat == "none" else remat
    unroll = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    pallas_norm = bool(int(sys.argv[7])) if len(sys.argv) > 7 else False
    img, T, K = 256, 1000, 8

    model = UNet(img_size=img, base_channels=base, in_channels=1,
                 attention_resolutions="16,8", n_heads=2,
                 space_to_depth=s2d, bf16_norm=bf16_norm,
                 pallas_norm=pallas_norm,
                 dtype=jnp.bfloat16)
    sched = make_schedule(get_beta_schedule(T, "linear"))
    sampler = make_noise_sampler("simplex")
    tx = make_optimizer(1e-4)
    state = jax.jit(lambda k: init_train_state(
        model, tx, k, (batch, img, img, 1)))(jax.random.key(0))

    step = make_train_step(model, sched, tx, sampler, max_t=800, remat=remat)
    multi = jax.jit(make_multi_step(step, K, unroll=unroll),
                    donate_argnums=(0,))

    # per-step FLOPs from the single-step program (cost_analysis of the
    # scanned program reports the whole scan)
    # donate like the real multi-step: without aliasing the state into the
    # output, the flops-counting compile carries ~1.9G of dead copies and
    # OOMs at batches the donated program fits (batch 48 measurement)
    single = jax.jit(step, donate_argnums=(0,))
    x1 = jnp.zeros((batch, img, img, 1), jnp.float32)
    flops = single.lower(state, x1, jax.random.key(0)).compile(
        ).cost_analysis()["flops"]

    xs = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (K, batch, img, img, 1)).astype(np.float32))
    st, _ = multi(state, xs, jax.random.key(999))  # warm compile
    jax.block_until_ready(st)
    times = []
    for i in range(5):
        a = xs + i * 1e-6  # vary inputs: the relay memoizes identical runs
        t0 = time.time()
        st, m = multi(st, a, jax.random.key(i))
        jax.block_until_ready(m["loss"])
        times.append(time.time() - t0)
    per_step = float(np.median(times)) / K
    mfu = flops / per_step / 1e12 / BF16_PEAK_TFLOPS
    print(json.dumps({
        "batch": batch, "bf16_norm": bf16_norm, "base": base, "s2d": s2d,
        "remat": remat or "none", "unroll": unroll,
        "pallas_norm": pallas_norm,
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "ms_per_step": round(per_step * 1e3, 2),
        "imgs_per_sec": round(batch / per_step, 1),
        "tflop_per_step": round(flops / 1e12, 3),
        "mfu": round(mfu, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
