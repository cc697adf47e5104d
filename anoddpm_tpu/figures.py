"""Paper-figure generation (reference: generate_images.py — C19 in
SURVEY.md §2).

Each generator drives the jitted forward_backward primitive and renders with
matplotlib/imageio into ``final-outputs/``.  CLI:
``python -m anoddpm_tpu.figures <ARG_NUM> <which>`` with
which in {sequence, masked_comparison, videos, ano, gauss_simplex,
varying_frequency, varying_t}.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import diffusion as dmod
from . import visualize as vz
from .data.datasets import anomalous_dataset_from_args
from .detect import _load_eval_model, detection_A_fixedT
from .training import jit_with_params
from .ops.noise import make_noise_sampler, sampler_from_args


def _out_dir(root_dir: str) -> str:
    d = os.path.join(root_dir, "final-outputs")
    os.makedirs(d, exist_ok=True)
    return d


def _first_slice(args, root_dir, index: int = 0):
    d_set = anomalous_dataset_from_args(root_dir, args)
    sample = d_set[index % len(d_set)]
    img = sample["image"]
    mask = sample.get("mask")
    if img.ndim == 4:  # (S, H, W, C) volumes -> first slice
        img, mask = img[:1], (mask[:1] if mask is not None else None)
    else:
        img = img[None]
        mask = mask[None] if mask is not None else None
    return jnp.asarray(img), (np.asarray(mask) if mask is not None else None)


def denoise_sequence(args, em, sched, root_dir: str = ".",
                     t_distance: Optional[int] = None, n_cols: int = 13):
    """Forward/backward filmstrip figure (generate_images.py:36-115)."""
    x, _ = _first_slice(args, root_dir)
    if t_distance is None:
        t_distance = int(args["sample_distance"]) // 2
    sampler = sampler_from_args(args)
    _, frames = jit_with_params(em, lambda mf: lambda xx, k:
        dmod.forward_backward(mf, sched, xx, t_distance, k,
                              noise_sampler=sampler,
                              see_whole_sequence="whole"))(x, jax.random.key(0))
    frames = np.asarray(frames)
    idxs = np.linspace(0, frames.shape[0] - 1, n_cols).astype(int)
    strip = np.concatenate([frames[i] for i in idxs], axis=0)
    vz.save_grid_png(os.path.join(_out_dir(root_dir),
                                  f"ARGS={args['arg_num']}-sequence.png"),
                     strip, row_size=n_cols)


def masked_comparison(args, em, sched, root_dir: str = ".",
                      t_distance: int = 250, n_volumes: int = 4):
    """Rows of (input, reconstruction, sq-err, prediction, mask)
    (generate_images.py:118-184)."""
    sampler = sampler_from_args(args)
    fb = jit_with_params(em, lambda mf: lambda xx, k:
        dmod.forward_backward(mf, sched, xx,
                              min(t_distance, sched.num_timesteps), k,
                              noise_sampler=sampler))
    rows = []
    for i in range(n_volumes):
        x, mask = _first_slice(args, root_dir, index=i)
        recon, _ = fb(x, jax.random.key(i))
        recon = np.asarray(recon)
        mse = ((np.asarray(x) - recon) ** 2 * 2) - 1
        pred = ((mse > 0).astype(np.float32) * 2) - 1
        mask_panel = mask if mask is not None else np.zeros_like(recon)
        rows.append(np.concatenate([np.asarray(x), recon, mse, pred,
                                    mask_panel], axis=0))
    vz.save_grid_png(os.path.join(_out_dir(root_dir),
                                  f"ARGS={args['arg_num']}-masked-comparison.png"),
                     np.concatenate(rows, axis=0), row_size=5)


def diffusion_videos(args, em, sched, root_dir: str = ".",
                     n_volumes: int = 2):
    """Per-volume partial-diffusion videos (generate_images.py:187-276)."""
    sampler = sampler_from_args(args)
    lam = int(args["sample_distance"]) // 2
    f = jit_with_params(em, lambda mf: lambda xx, k:
        dmod.forward_backward(mf, sched, xx, lam, k, noise_sampler=sampler,
                              see_whole_sequence="whole"))
    for i in range(n_volumes):
        x, _ = _first_slice(args, root_dir, index=i)
        _, frames = f(x, jax.random.key(i))
        vz.save_video(os.path.join(_out_dir(root_dir),
                                   f"ARGS={args['arg_num']}-video-{i}.mp4"),
                      list(np.asarray(frames)))


def gauss_simplex_comparison(args, em, sched, root_dir: str = ".",
                             t_distance: int = 250):
    """Side-by-side Gaussian vs simplex reconstruction rows
    (generate_images.py:397-543)."""
    x, mask = _first_slice(args, root_dir)
    td = min(t_distance, sched.num_timesteps)
    rows = []
    for kind in ("gauss", "simplex"):
        sampler = make_noise_sampler(kind)
        recon, _ = jit_with_params(em, lambda mf: lambda xx, k:
            dmod.forward_backward(mf, sched, xx, td, k,
                                  noise_sampler=sampler))(x, jax.random.key(7))
        recon = np.asarray(recon)
        mse = ((np.asarray(x) - recon) ** 2 * 2) - 1
        pred = ((mse > 0).astype(np.float32) * 2) - 1
        mask_panel = mask if mask is not None else np.zeros_like(recon)
        rows.append(np.concatenate([np.asarray(x), recon, mse, pred,
                                    mask_panel], axis=0))
    vz.save_grid_png(os.path.join(_out_dir(root_dir),
                                  f"ARGS={args['arg_num']}-gauss-vs-simplex.png"),
                     np.concatenate(rows, axis=0), row_size=5)


def varying_frequency(args, em, sched, root_dir: str = ".",
                      end_freq: int = 6):
    """Fig-3-style frequency sweep grid via detection_A_fixedT
    (generate_images.py:696-788)."""
    x, mask = _first_slice(args, root_dir)
    mask_panel = mask if mask is not None else np.zeros(np.asarray(x).shape)
    grid = detection_A_fixedT(args, em, sched, x, mask_panel,
                              root_dir=root_dir, end_freq=end_freq,
                              t_distance=min(250, sched.num_timesteps))
    vz.save_grid_png(os.path.join(_out_dir(root_dir),
                                  f"ARGS={args['arg_num']}-varying-frequency.png"),
                     grid, row_size=6)


def gauss_varying_t(args, em, sched, root_dir: str = ".",
                    lambdas=(250, 500, 750)):
    """Gaussian reconstructions at lambda in {250, 500, 750}
    (generate_images.py:791-932)."""
    x, mask = _first_slice(args, root_dir)
    sampler = make_noise_sampler("gauss")
    rows = [np.asarray(x)]
    for lam in lambdas:
        lam = min(lam, sched.num_timesteps)
        recon, _ = jit_with_params(em, lambda mf: lambda xx, k:
            dmod.forward_backward(mf, sched, xx, lam, k,
                                  noise_sampler=sampler))(x, jax.random.key(lam))
        rows.append(np.asarray(recon))
    rows.append(mask if mask is not None else np.zeros_like(rows[0]))
    vz.save_grid_png(os.path.join(_out_dir(root_dir),
                                  f"ARGS={args['arg_num']}-gauss-varyingT.png"),
                     np.concatenate(rows, axis=0), row_size=len(rows))


GENERATORS = {
    "sequence": denoise_sequence,
    "masked_comparison": masked_comparison,
    "videos": diffusion_videos,
    "gauss_simplex": gauss_simplex_comparison,
    "varying_frequency": varying_frequency,
    "varying_t": gauss_varying_t,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        raise SystemExit(f"usage: python -m anoddpm_tpu.figures <ARG_NUM> "
                         f"[{'|'.join(GENERATORS)}|all]")
    token = argv[0]
    which = argv[1] if len(argv) > 1 else "all"
    args, em, sched = _load_eval_model(".", token)
    targets = GENERATORS if which == "all" else {which: GENERATORS[which]}
    for name, fn in targets.items():
        print(f"generating {name}...", flush=True)
        fn(args, em, sched)


if __name__ == "__main__":
    main()
