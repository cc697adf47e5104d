"""Training entry point: ``python -m anoddpm_tpu.train <ARG_NUM>``.

Mirrors the reference CLI contract (diffusion_training.py:255-392): the
positional argument selects ``configs/args{N}.json`` ("28" / "args28" /
"args28.json" all accepted), with optional RESUME_RECENT / RESUME_FINAL
tokens before it.  The loop keeps the reference recipe — 100 imgs/epoch
(CIFAR: 200 iters), AdamW + grad-clip 1.0, EMA 0.9999, snapshot every 50
epochs, VLB log every 200, checkpoint every 1000, final save then test-set
eval — but the whole step is one jitted XLA program and batches stream
through an async host prefetcher onto the data mesh.
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import diffusion as dmod
from . import evaluation as ev
from . import visualize as vz
from .observe import MetricsLogger, ProfileWindow, StepTimer
from .checkpoint import (load_checkpoint, purge_checkpoints,
                         save_checkpoint)
from .config import load_args, resolve_in_channels
from .data.datasets import dataset_from_args
from .data.pipeline import batch_iterator, prefetch_to_device
from .models.unet import unet_from_args
from .ops.noise import sampler_from_args
from .parallel.mesh import make_mesh
from .training import (EvalModel, init_train_state, jit_multi_step,
                       jit_train_step, jit_with_params, make_eval_model_fn,
                       make_optimizer, make_train_step, TrainState)


def train(args, root_dir: str = ".", resume: Optional[str] = None,
          mesh=None, max_epochs: Optional[int] = None) -> TrainState:
    in_channels = resolve_in_channels(args)
    model = unet_from_args(args, in_channels)
    from .schedule import schedule_from_args
    sched = schedule_from_args(args)
    noise_sampler = sampler_from_args(args)
    tx = make_optimizer(float(args["lr"]),
                        float(args.get("weight_decay", 0) or 0),
                        float(args.get("grad_clip_norm", 1.0) or 1.0))

    img_size = args["img_size"]
    batch_size = int(args["Batch_Size"])
    sample_shape = (batch_size, img_size[0], img_size[1], in_channels)
    key = jax.random.key(int(args.get("seed", 0) or 0))
    key, init_key = jax.random.split(key)

    state = jax.jit(
        lambda k: init_train_state(model, tx, k, sample_shape))(init_key)
    start_epoch = 0

    if resume:
        use_ckpt = resume == "RESUME_RECENT"
        target = {"model": state.params, "ema": state.ema_params,
                  "opt": state.opt_state}
        payload, meta = load_checkpoint(root_dir, args["arg_num"],
                                        use_checkpoint=use_ckpt,
                                        target_payload=target)
        state = TrainState(step=state.step, params=payload["model"],
                           ema_params=payload["ema"], opt_state=payload["opt"])
        start_epoch = int(meta["n_epoch"])
        print(f"resumed from epoch {start_epoch}")

    # Sampling upper bound: never train on t >= lambda_max when train_start
    # (GaussianDiffusion.py:419-427).
    if args.get("train_start"):
        max_t = min(int(args["sample_distance"]), sched.num_timesteps)
    else:
        max_t = sched.num_timesteps

    base_step = make_train_step(
        model, sched, tx, noise_sampler,
        loss_type=str(args.get("loss-type") or "l2"),
        max_t=max_t,
        ema_decay=float(args.get("ema_decay", 0.9999) or 0.9999),
        loss_weight=str(args.get("loss_weight") or "none"),
        dropout=float(args.get("dropout", 0) or 0) > 0)
    substeps = int(args.get("train_substeps") or 1)
    if substeps > 1:
        train_step = jit_multi_step(base_step, substeps, mesh=mesh)
    else:
        train_step = jit_train_step(base_step, mesh=mesh)

    dataset = dataset_from_args(root_dir, args, train=True)
    test_dataset = dataset_from_args(root_dir, args, train=False)
    # substep stacking happens on the prefetch thread (already sharded on
    # arrival) so the step loop never stalls on host-side jnp.stack
    loader = prefetch_to_device(
        batch_iterator(dataset, batch_size, shuffle=True), mesh=mesh,
        substeps=substeps)
    test_loader = batch_iterator(test_dataset, batch_size, shuffle=True, seed=1)

    is_cifar = str(args.get("dataset", "")).lower() == "cifar"
    iters_per_epoch = int(args.get("iters_per_epoch") or
                          (200 if is_cifar else max(100 // batch_size, 1)))
    epochs = int(args["EPOCHS"]) if max_epochs is None else max_epochs
    checkpoint_every = int(args.get("checkpoint_every", 1000) or 1000)

    vlb_fn = None
    snap_fn = None
    xt_fn = None
    start_time = time.time()
    losses = []
    vlb_log = []
    mlog = MetricsLogger(f"{root_dir}/metrics/args{args['arg_num']}-train.jsonl")
    timer = StepTimer()
    prof = ProfileWindow(f"train-args{args['arg_num']}")

    try:
        for epoch in range(start_epoch, epochs + 1):
            prof.start_epoch(epoch - start_epoch)
            epoch_losses = []
            for i in range(max(iters_per_epoch // substeps, 1)):
                batch = next(loader)
                x = batch["image"]
                x_vis = x[-1] if substeps > 1 else x
                state, metrics = train_step(state, x, key)
                timer.tick()
                epoch_losses.append(metrics["loss"])

                if epoch % 50 == 0 and i == 0 and args.get("save_imgs"):
                    out_path = (f"{root_dir}/diffusion-training-images/"
                                f"ARGS={args['arg_num']}/EPOCH={epoch}.png")
                    if epoch % 100 == 0:
                        # real / sample / pred_x_0 grid from ONE EMA reverse step
                        # at a random t (diffusion_training.py:211-221; the
                        # reference q-jumps with torch.rand_like — uniform noise,
                        # a quirk we normalise to the training noise sampler)
                        if snap_fn is None:
                            def _snap(params, xx, k):
                                tk, nk, sk = jax.random.split(k, 3)
                                tt = dmod.sample_timesteps(
                                    tk, xx.shape[0], sched.num_timesteps)
                                x_t = dmod.sample_q(
                                    sched, xx, tt, noise_sampler(nk, xx.shape, tt))
                                mf = lambda a, b: model.apply(params, a, b)
                                return dmod.sample_p(mf, sched, x_t, tt, sk)
                            snap_fn = jax.jit(_snap)
                        key, sub = jax.random.split(key)
                        sample, pred_x0 = snap_fn(state.ema_params,
                                                  jnp.asarray(x_vis), sub)
                        vz.sample_snapshot(out_path, np.asarray(x_vis),
                                           np.asarray(sample),
                                           np.asarray(pred_x0), epoch)
                    else:
                        # real / x_t / eps-hat / sq-err grid
                        # (diffusion_training.py:224-235).  Recomputed on demand
                        # from the current batch — the train step does not ship
                        # x_t/estimate back through its metrics (HBM + gather
                        # cost every step for an every-50-epochs artifact).
                        if xt_fn is None:
                            def _xt(params, xx, k):
                                tk, nk = jax.random.split(k)
                                tt = dmod.sample_timesteps(tk, xx.shape[0], max_t)
                                x_t = dmod.sample_q(
                                    sched, xx, tt, noise_sampler(nk, xx.shape, tt))
                                return x_t, model.apply(params, x_t, tt)
                            xt_fn = jax.jit(_xt)
                        key, sub = jax.random.split(key)
                        x_t, est = xt_fn(state.params, jnp.asarray(x_vis), sub)
                        vz.training_snapshot(out_path, np.asarray(x_vis),
                                             np.asarray(x_t), np.asarray(est),
                                             epoch)

            prof.end_epoch(epoch - start_epoch)
            losses.append(float(jnp.mean(jnp.stack(epoch_losses))))
            if epoch % 10 == 0:
                mlog.log(int(state.step), epoch=epoch, loss=losses[-1],
                         grad_norm=metrics["grad_norm"],
                         imgs_per_sec=(batch_size * substeps / timer.mean
                                       if timer.mean == timer.mean else 0.0))

            if epoch % 200 == 0:
                if vlb_fn is None:
                    vlb_fn = jax.jit(
                        lambda params, x, k: dmod.calc_total_vlb(
                            make_eval_model_fn(model, params), sched, x, k))
                key, sub = jax.random.split(key)
                vlb_terms = vlb_fn(state.params, jnp.asarray(x_vis), sub)
                vlb_log.append(float(jnp.mean(vlb_terms["total_vlb"])))
                elapsed = time.time() - start_time
                done = epoch + 1 - start_epoch
                eta = (epochs - epoch) * (elapsed / done)
                print(f"epoch: {epoch}, loss: {losses[-1]:.5f}, "
                      f"total VLB: {vlb_log[-1]:.4f} "
                      f"(mean of last 10: {np.mean(vlb_log[-10:]):.4f}), "
                      f"prior vlb: {float(jnp.mean(vlb_terms['prior_vlb'])):.2f}, "
                      f"vb: {float(jnp.mean(vlb_terms['vb'])):.3f}, "
                      f"x_0_mse: {float(jnp.mean(vlb_terms['x_0_mse'])):.3f}, "
                      f"mse: {float(jnp.mean(vlb_terms['mse'])):.3f}, "
                      f"elapsed {elapsed:.0f}s, eta {eta:.0f}s", flush=True)

            if epoch % checkpoint_every == 0 and epoch > start_epoch:
                save_checkpoint(root_dir, args, epoch, state.params,
                                state.ema_params, state.opt_state,
                                loss=losses[-1])

            if (epoch % 500 == 0 and args.get("save_vids")
                    and epoch > start_epoch):
                key, sub = jax.random.split(key)
                lam = int(args["sample_distance"]) // (2 if epoch % 1000 == 0 else 4)
                em = EvalModel(model, state.ema_params)
                _, frames = jit_with_params(em, lambda mf: lambda x, k:
                    dmod.forward_backward(mf, sched, x, lam, k,
                                          noise_sampler=noise_sampler,
                                          see_whole_sequence="half"))(
                    jnp.asarray(x_vis), sub)
                vz.save_video(
                    f"{root_dir}/diffusion-videos/ARGS={args['arg_num']}/"
                    f"sample-EPOCH={epoch}.mp4",
                    list(np.asarray(frames)), row_size=min(8, batch_size))

    finally:
        # profiler state is process-global: always close the trace and
        # the metrics log, even when the epoch loop unwinds on an error
        prof.stop()
        mlog.close()
    save_checkpoint(root_dir, args, epochs, state.params, state.ema_params,
                    state.opt_state, final=True)
    purge_checkpoints(root_dir, args["arg_num"])

    # final test-set suite (diffusion_training.py:153) — staged campaigns
    # that run their own `evaluation.testing` after each training slice set
    # skip_test_eval so intermediate slices don't pay the VLB sweep twice
    if not args.get("skip_test_eval"):
        ev.testing(iter(test_loader), EvalModel(model, state.ema_params),
                   sched, args,
                   noise_sampler=noise_sampler, root_dir=root_dir,
                   save_videos=bool(args.get("save_vids")))
    return state


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    resume = None
    for flag in ("RESUME_RECENT", "RESUME_FINAL"):
        if flag in argv:
            resume = flag
            argv.remove(flag)
    if not argv:
        raise SystemExit("usage: python -m anoddpm_tpu.train [RESUME_RECENT|"
                         "RESUME_FINAL] <ARG_NUM>")
    args = load_args(argv[0])
    print(f"args{args['arg_num']}: {dict(args)}")
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    train(args, resume=resume, mesh=mesh)


if __name__ == "__main__":
    main()
