"""A/B the bf16_norm knob (GroupNorm elementwise path in activation dtype,
statistics still fp32 — models/unet.py:GroupNorm32) on the real chip.

The round-2 train-step trace (BENCHNOTES.md trace table) attributes ~16% of
device time to convert+reduce fusions around the fp32 GroupNorms, so this
measures both directions of the knob:

  1. fused 4-substep TRAIN step, paper config (256^2 base-128 batch 8)
  2. DDIM-25 INFERENCE chain, headline config (s2d-2 base-64 batch 32)

and (optionally, --quality) trains a fresh s2d model with bf16_norm=True
through the real recipe and evaluates the lambda=200 protocol, appending a
"s2d64_ddim25_eta1_bf16norm/seed0" entry to results/seed_replication.json
for a direct AUC/Dice comparison against the fp32-norm seeds.

Writes timing results to results/bf16_norm_ab.json.
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

RESULTS = "results/bf16_norm_ab.json"


def _save(res):
    os.makedirs("results", exist_ok=True)
    with open(RESULTS + ".tmp", "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    os.replace(RESULTS + ".tmp", RESULTS)


def time_train_step(bf16_norm: bool, batch=8, img=256, base=128,
                    substeps=4, repeats=5):
    from anoddpm_tpu.models.unet import UNet
    from anoddpm_tpu.ops.noise import make_noise_sampler
    from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
    from anoddpm_tpu.training import (init_train_state, make_multi_step,
                                      make_optimizer, make_train_step)

    model = UNet(img_size=img, base_channels=base, in_channels=1,
                 attention_resolutions="16,8", n_heads=2,
                 bf16_norm=bf16_norm, dtype=jnp.bfloat16)
    sched = make_schedule(get_beta_schedule(1000, "linear"))
    tx = make_optimizer(1e-4)
    state = jax.jit(lambda k: init_train_state(
        model, tx, k, (batch, img, img, 1)))(jax.random.key(0))
    step = jax.jit(make_multi_step(
        make_train_step(model, sched, tx, make_noise_sampler("simplex"),
                        max_t=800), substeps), donate_argnums=(0,))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (substeps, batch, img, img, 1)).astype(np.float32))
    state, m = step(state, x, jax.random.key(99))
    jax.block_until_ready(m["loss"])
    times = []
    for i in range(repeats):
        t0 = time.time()
        state, m = step(state, x + i * 1e-6, jax.random.key(i))
        jax.block_until_ready(m["loss"])
        times.append(time.time() - t0)
    ms = float(np.median(times)) / substeps * 1e3
    return {"ms_per_step": round(ms, 1),
            "imgs_per_sec": round(batch / (ms / 1e3), 1)}


def time_inference(bf16_norm: bool, batch=32, img=256, base=64, s2d=2,
                   t_distance=250, ddim_steps=25, repeats=3):
    from anoddpm_tpu import diffusion as dm
    from anoddpm_tpu.models.unet import UNet
    from anoddpm_tpu.ops.noise import make_noise_sampler
    from anoddpm_tpu.schedule import get_beta_schedule, make_schedule

    sched = make_schedule(get_beta_schedule(1000, "linear"))
    model = UNet(img_size=img, base_channels=base, in_channels=1,
                 attention_resolutions="16,8", n_heads=2,
                 space_to_depth=s2d, bf16_norm=bf16_norm,
                 dtype=jnp.bfloat16)
    x = jnp.zeros((batch, img, img, 1))
    t = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    sampler = make_noise_sampler("simplex")

    @jax.jit
    def fb(params, xx, k):
        mf = lambda a, b: model.apply(params, a, b)
        return dm.forward_backward_ddim(mf, sched, xx, t_distance,
                                        ddim_steps, k,
                                        noise_sampler=sampler, eta=1.0)

    fb(params, x, jax.random.key(999))[0].block_until_ready()
    t0 = time.time()
    for i in range(repeats):
        fb(params, x, jax.random.key(i))[0].block_until_ready()
    dt = (time.time() - t0) / repeats
    return {"slices_per_sec": round(batch / dt, 1)}


def quality_cell(seed=0):
    """Train + evaluate one bf16_norm s2d model through the production
    recipe (same protocol as scripts/seed_replication.py cell B)."""
    import copy
    from anoddpm_tpu.config import load_args
    from anoddpm_tpu.detect import (_load_eval_model,
                                    anomalous_metric_calculation)
    from anoddpm_tpu.train import train

    args = copy.deepcopy(load_args("256syn64s2d"))
    args["seed"] = seed
    args["train_substeps"] = 8
    args["bf16_norm"] = True
    token = f"256syn64s2d_bf16n_s{seed}"
    args["arg_num"] = token
    final = os.path.join("model", f"diff-params-ARGS={token}",
                         "params-final", "payload.msgpack")
    if not os.path.exists(final):
        train(args)
    eval_args, em, sched = _load_eval_model(".", token)
    eval_args["sampler"] = "ddim"
    eval_args["ddim_steps"] = 25
    eval_args["ddim_eta"] = 1.0
    summary = anomalous_metric_calculation(args=eval_args, em=em, sched=sched)
    rep_path = "results/seed_replication.json"
    rep = json.load(open(rep_path)) if os.path.exists(rep_path) else {}
    rep[f"s2d64_ddim25_eta1_bf16norm/seed{seed}"] = {
        k: summary[k] for k in ("auc", "dice", "ssim", "iou")}
    with open(rep_path + ".tmp", "w") as f:
        json.dump(rep, f, indent=1, sort_keys=True)
    os.replace(rep_path + ".tmp", rep_path)
    print(f"bf16_norm quality: AUC {summary['auc']:.4f} "
          f"Dice {summary['dice']:.4f}", flush=True)


def main():
    res = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    for bf16 in (False, True):
        tag = "bf16_norm" if bf16 else "fp32_norm"
        if f"train/{tag}" not in res:
            res[f"train/{tag}"] = time_train_step(bf16)
            print(f"train/{tag}: {res[f'train/{tag}']}", flush=True)
            _save(res)
        if f"infer/{tag}" not in res:
            res[f"infer/{tag}"] = time_inference(bf16)
            print(f"infer/{tag}: {res[f'infer/{tag}']}", flush=True)
            _save(res)
    if "--quality" in sys.argv:
        # optional trailing seed list widens the evidence beyond n=1
        # (VERDICT r3 weak #5); aggregate recomputed over all seeds present
        seeds = [int(a) for a in sys.argv[sys.argv.index("--quality") + 1:]
                 if a.isdigit()] or [0]
        for s in seeds:
            quality_cell(seed=s)
        rep_path = "results/seed_replication.json"
        rep = json.load(open(rep_path))
        cell = "s2d64_ddim25_eta1_bf16norm"
        vals = {m: [v[m] for k, v in rep.items()
                    if k.startswith(cell + "/seed")]
                for m in ("auc", "dice", "ssim", "iou")}
        rep[cell + "/aggregate"] = {
            m: {"mean": float(np.mean(v)), "std": float(np.std(v)),
                "n": len(v)} for m, v in vals.items()}
        with open(rep_path + ".tmp", "w") as f:
            json.dump(rep, f, indent=1, sort_keys=True)
        os.replace(rep_path + ".tmp", rep_path)
        print("aggregate:", json.dumps(rep[cell + "/aggregate"]["auc"]))


if __name__ == "__main__":
    main()
