"""Decompose on-chip train-step time: forward loss vs value_and_grad vs the
full fused step (grad + clip + AdamW + EMA), plus XLA's own FLOP estimate.

VERDICT.md round-1 item 1: locate the 2-3x gap between the measured train
step and the forward roofline before optimizing.  Run on the real TPU.

Usage: python scripts/train_step_decompose.py [batch] [base_channels] [s2d]
"""
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

from anoddpm_tpu import diffusion as dm
from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.ops.noise import make_noise_sampler
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import (init_train_state, make_optimizer,
                                  make_train_step)

BF16_PEAK_TFLOPS = 197.0  # v5e


def timeit(fn, args_fn, iters=8):
    out = fn(*args_fn(999))
    jax.block_until_ready(out)
    times = []
    for i in range(iters):
        a = args_fn(i)
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        times.append(time.time() - t0)
    return float(np.median(times)), float(np.std(times))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    s2d = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    img = 256
    T = 1000

    model = UNet(img_size=img, base_channels=base, in_channels=1,
                 attention_resolutions="16,8", n_heads=2,
                 space_to_depth=s2d, dtype=jnp.bfloat16)
    sched = make_schedule(get_beta_schedule(T, "linear"))
    sampler = make_noise_sampler("simplex")
    tx = make_optimizer(1e-4)
    state = jax.jit(lambda k: init_train_state(
        model, tx, k, (batch, img, img, 1)))(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (batch, img, img, 1)).astype(np.float32))

    def loss_only(params, xx, key):
        t_key, n_key = jax.random.split(key)
        t = dm.sample_timesteps(t_key, xx.shape[0], 800)
        per_sample, _ = dm.calc_loss(
            lambda a, b: model.apply(params, a, b), sched, xx, t, n_key,
            sampler, "l2")
        return jnp.mean(per_sample)

    fwd = jax.jit(loss_only)
    vg = jax.jit(lambda p, xx, k: jax.value_and_grad(loss_only)(p, xx, k))
    step = jax.jit(make_train_step(model, sched, tx, sampler, max_t=800),
                   donate_argnums=(0,))

    ms_fwd, sd_fwd = timeit(fwd, lambda i: (state.params, x + i * 1e-6,
                                            jax.random.key(i)))
    ms_vg, sd_vg = timeit(vg, lambda i: (state.params, x + i * 1e-6,
                                         jax.random.key(i)))

    # full step donates state: thread it through the iterations
    st = [state]

    def step_args(i):
        return (st[0], x + i * 1e-6, jax.random.key(i))

    def step_and_keep(s, xx, k):
        new_s, m = step(s, xx, k)
        st[0] = new_s
        return m["loss"]

    ms_step, sd_step = timeit(step_and_keep, step_args)

    # fused K-step scan: one dispatch amortises the relay/host overhead, so
    # per-step time approaches the true on-chip cost
    K = int(os.environ.get("DECOMPOSE_SUBSTEPS", "8"))
    from anoddpm_tpu.training import make_multi_step
    multi = jax.jit(make_multi_step(
        make_train_step(model, sched, tx, sampler, max_t=800), K),
        donate_argnums=(0,))
    xs = jnp.broadcast_to(x, (K,) + x.shape)
    st2 = [state]

    def multi_args(i):
        return (st2[0], xs + i * 1e-6, jax.random.key(i))

    def multi_keep(s, xx, k):
        new_s, m = multi(s, xx, k)
        st2[0] = new_s
        return m["loss"]

    ms_multi, sd_multi = timeit(multi_keep, multi_args, iters=4)

    flops_fwd = fwd.lower(state.params, x, jax.random.key(0)).compile(
        ).cost_analysis()["flops"]
    flops_vg = vg.lower(state.params, x, jax.random.key(0)).compile(
        ).cost_analysis()["flops"]

    def line(tag, t, sd, flops=None):
        msg = f"{tag:28s} {t * 1e3:8.1f} ms  (sd {sd * 1e3:5.1f})"
        if flops:
            mfu = flops / t / 1e12 / BF16_PEAK_TFLOPS
            msg += f"  {flops / 1e12:6.2f} TFLOP  MFU {mfu * 100:5.1f}%"
        print(msg, flush=True)

    print(f"config: {img}^2 base-{base} s2d-{s2d} batch {batch} bf16")
    line("forward loss", ms_fwd, sd_fwd, flops_fwd)
    line("value_and_grad", ms_vg, sd_vg, flops_vg)
    line("full step (+opt+EMA)", ms_step, sd_step, flops_vg)
    line(f"fused {K}-step scan, per step", ms_multi / K, sd_multi / K,
         flops_vg)
    print(f"bwd/fwd time ratio: {ms_vg / ms_fwd:.2f}  "
          f"opt+EMA overhead: {(ms_step - ms_vg) * 1e3:.1f} ms  "
          f"relay overhead/dispatch: {(ms_step - ms_multi / K) * 1e3:.1f} ms  "
          f"imgs/sec/chip (fused): {batch * K / ms_multi:.1f}")


if __name__ == "__main__":
    main()
