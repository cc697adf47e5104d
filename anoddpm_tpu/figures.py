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


def make_prediction(real, recon, mask, x_t, threshold: float = 0.5,
                    error_fn: str = "sq"):
    """The reusable 6-panel builder (generate_images.py:14-33): returns
    (panels, thresholded_error) with panels stacked in the order
    (real, x_t, reconstruction, error map, thresholded error, mask),
    each (B, H, W, C), all in [-1, 1] display range.

    error_fn "sq": err = ((recon - real)^2 * 2) - 1, thresholded against
    (threshold * 2) - 1; "l1": raw signed difference.
    """
    real = np.asarray(real)
    recon = np.asarray(recon)
    mask = np.asarray(mask)
    x_t = np.asarray(x_t)
    if error_fn == "l1":
        err = recon - real
    else:
        err = ((recon - real) ** 2 * 2) - 1
    pred = ((err > (threshold * 2) - 1).astype(np.float32) * 2) - 1
    panels = np.concatenate([real, x_t, recon, err, pred, mask], axis=0)
    return panels, pred


def _make_whole_fb(em, sched, t_distance: int, sampler):
    """Jitted "whole"-capture forward_backward — build ONCE per
    (model, t_distance) and reuse across rows/attempts: each jit_with_params
    call owns a fresh compilation cache, so per-call construction would
    recompile the full reverse chain every row."""
    return jit_with_params(em, lambda mf: lambda xx, k:
        dmod.forward_backward(mf, sched, xx, t_distance, k,
                              noise_sampler=sampler,
                              see_whole_sequence="whole"))


def _whole_sequence(args, em, sched, x, t_distance: int, key,
                    sampler=None, fb=None):
    """Run "whole"-capture forward_backward and prepend x_0, matching the
    reference's seq list (x_0, forward..x_lambda, reverse..x_0').

    `sampler` and `fb` are mutually exclusive: a prebuilt `fb` already owns
    its sampler, so passing both with a mismatched sampler would silently
    use the fb's (ADVICE round-2)."""
    if fb is not None and sampler is not None:
        raise ValueError("pass either a prebuilt fb or a sampler, not both "
                         "(the fb already owns its noise sampler)")
    if fb is None:
        fb = _make_whole_fb(em, sched, t_distance,
                            sampler or sampler_from_args(args))
    recon, frames = fb(x, key)
    full = np.concatenate([np.asarray(x)[None], np.asarray(frames)])
    return np.asarray(recon), full


def _mirror_indices(n_frames: int, n_fwd: int) -> np.ndarray:
    """Filmstrip frame indices (generate_images.py:48-68): `n_fwd` frames
    evenly spaced over the forward half, n_fwd-1 mirrored from the end of
    the reverse half."""
    fwd_idx = np.linspace(0, n_frames // 2, n_fwd).astype(int)
    bwd_idx = (-1 * fwd_idx[-2::-1]) - 1
    return np.append(fwd_idx, bwd_idx)


def _sequence_row(frames, prediction, mask, n_fwd: int = 6):
    """One filmstrip row: mirrored frames, then prediction and ground-truth
    mask."""
    idxs = _mirror_indices(len(frames), n_fwd)
    panels = [frames[i] for i in idxs] + [prediction, mask]
    return np.concatenate(panels, axis=0), len(panels)


def ano_outputs(args, em, sched, root_dir: str = ".", n_attempts: int = 3,
                rows: int = 1, t_distance: int = 250,
                threshold: float = 0.5):
    """Per-attempt anomalous output sheets (generate_images.py:279-394
    `make_ano_outputs`): for each attempt, `rows` anomalous slices are run
    through "whole" partial diffusion; two figures are written per attempt —
    the 6-panel prediction grid (via `make_prediction`) and the 13-column
    denoise filmstrip with prediction + mask columns.  The reference
    hardcodes rows=1, t_distance=250 after its random draws
    (generate_images.py:333 — the draws are dead); we take them as
    arguments with those defaults.
    """
    td = max(1, min(t_distance, sched.num_timesteps))
    out_dir = os.path.join(_out_dir(root_dir), f"ARGS={args['arg_num']}")
    os.makedirs(out_dir, exist_ok=True)
    fb = _make_whole_fb(em, sched, td, sampler_from_args(args))
    for attempt in range(n_attempts):
        pred_rows, seq_rows = [], []
        n_cols = 13
        for r in range(rows):
            x, mask = _first_slice(args, root_dir, index=attempt * rows + r)
            mask_panel = (mask if mask is not None
                          else np.zeros(np.asarray(x).shape, np.float32))
            recon, full = _whole_sequence(args, em, sched, x, td,
                                          jax.random.key(attempt * 97 + r),
                                          fb=fb)
            panels, pred = make_prediction(np.asarray(x), recon, mask_panel,
                                           full[max(td // 2, 1)], threshold)
            pred_rows.append(panels)
            row, n_cols = _sequence_row(full, pred, mask_panel)
            seq_rows.append(row)
        vz.save_grid_png(
            os.path.join(out_dir,
                         f"attempt={attempt + 1}-{threshold}-predictions.png"),
            np.concatenate(pred_rows, axis=0), row_size=6)
        vz.save_grid_png(
            os.path.join(out_dir,
                         f"attempt={attempt + 1}-{threshold}-sequence.png"),
            np.concatenate(seq_rows, axis=0), row_size=n_cols)


def ce_outputs(args, ce_model=None, ce_params=None, root_dir: str = ".",
               n_attempts: int = 3, rows: int = 2, window: int = 4,
               ce_train_steps: int = 2000, threshold: float = 0.5):
    """Context-encoder baseline output sheets (generate_images.py:935-1056
    `make_gan_outputs`): per attempt, `rows` anomalous slices are
    reconstructed by the sliding-window CE and rendered as
    (x_0, reconstruction, square error, prediction, ground-truth mask) rows
    — the reference's 5-panel sheet — written to
    final-outputs/ARGS={n}/ce-attempt={k}-predictions.png.

    The reference's own CE figure path imports code absent from its repo
    (Comparative_models/CE.py, SURVEY.md §2.2); this renders the same sheet
    from the framework's working baseline (models/context_encoder.py).
    Pass a trained (ce_model, ce_params) to reuse one; otherwise the CE is
    trained on the config's healthy set for `ce_train_steps` steps.
    """
    from .baselines import train_context_encoder
    from .models.context_encoder import sliding_window_inpaint
    if ce_params is None:
        ce_model, ce_params = train_context_encoder(args, root_dir=root_dir,
                                                    steps=ce_train_steps)
    inpaint = jax.jit(lambda x: sliding_window_inpaint(ce_model, ce_params,
                                                       x, window))
    out_dir = os.path.join(_out_dir(root_dir), f"ARGS={args['arg_num']}")
    os.makedirs(out_dir, exist_ok=True)
    for attempt in range(n_attempts):
        sheet = []
        for r in range(rows):
            x, mask = _first_slice(args, root_dir, index=attempt * rows + r)
            x = np.asarray(x)
            mask_panel = (mask if mask is not None
                          else np.zeros(x.shape, np.float32))
            recon = np.asarray(inpaint(jnp.asarray(x)))
            # square-error and naive-threshold prediction panels in [-1, 1]
            # display range (generate_images.py:1012-1015 convention)
            mse = ((recon - x) ** 2 * 2) - 1
            pred = (((recon - x) ** 2 > threshold).astype(np.float32) * 2) - 1
            sheet.append(np.concatenate([x, recon, mse, pred, mask_panel],
                                        axis=0))
        vz.save_grid_png(
            os.path.join(out_dir, f"ce-attempt={attempt + 1}-predictions.png"),
            np.concatenate(sheet, axis=0), row_size=5)


def test_set_outputs(simplex_token, gauss_token, root_dir: str = ".",
                     anomalous: bool = False, t_distance: int = 250,
                     n_attempts: int = 2, use_checkpoint: bool = False):
    """The paper's Figure-1 generator (generate_images.py:546-693
    `make_test_set_outputs`): rows of 7-column "whole" diffusion filmstrips
    (4 forward frames, 3 reverse) for the SAME input images under the
    simplex-trained and the gauss-trained checkpoints, on the healthy test
    set (2 rows each) or the anomalous set (1 row each).
    """
    args_s, em_s, sched_s = _load_eval_model(root_dir, simplex_token,
                                             use_checkpoint)
    args_g, em_g, sched_g = _load_eval_model(root_dir, gauss_token,
                                             use_checkpoint)
    td = max(1, min(t_distance, sched_s.num_timesteps,
                    sched_g.num_timesteps))
    rows = 1 if anomalous else 2
    out_dir = os.path.join(_out_dir(root_dir), f"ARGS={args_s['arg_num']}")
    os.makedirs(out_dir, exist_ok=True)

    if anomalous:
        def get_image(i):
            x, _ = _first_slice(args_s, root_dir, index=i)
            return x
    else:
        from .data.datasets import dataset_from_args
        d_set = dataset_from_args(root_dir, args_s, train=False)

        def get_image(i):
            return jnp.asarray(d_set[i % len(d_set)]["image"][None])

    fbs = {tag: _make_whole_fb(em, sched, td, sampler_from_args(args_m))
           for args_m, em, sched, tag in ((args_s, em_s, sched_s, "simplex"),
                                          (args_g, em_g, sched_g, "gauss"))}
    for attempt in range(n_attempts):
        imgs = [get_image(attempt * rows + r) for r in range(rows)]
        sequences = []
        for args_m, em, sched, tag in ((args_s, em_s, sched_s, "simplex"),
                                       (args_g, em_g, sched_g, "gauss")):
            for r, x in enumerate(imgs):
                _, full = _whole_sequence(args_m, em, sched, x, td,
                                          jax.random.key(attempt * 31 + r),
                                          fb=fbs[tag])
                sequences.append(full)
        idxs = _mirror_indices(len(sequences[0]), n_fwd=4)
        grid = np.concatenate(
            [np.concatenate([seq[i] for i in idxs], axis=0)
             for seq in sequences], axis=0)
        vz.save_grid_png(
            os.path.join(out_dir,
                         f"test_set_mixed_attempt={attempt + 1}-sequence.png"),
            grid, row_size=len(idxs))


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
    """Rows of make_prediction 6-panels: (input, x_t, reconstruction,
    sq-err, prediction, mask) (generate_images.py:118-184, panels built by
    :14-33)."""
    sampler = sampler_from_args(args)
    td = min(t_distance, sched.num_timesteps)
    fb = jit_with_params(em, lambda mf: lambda xx, k:
        dmod.forward_backward(mf, sched, xx, td, k, noise_sampler=sampler,
                              see_whole_sequence="half"))
    rows = []
    for i in range(n_volumes):
        x, mask = _first_slice(args, root_dir, index=i)
        recon, frames = fb(x, jax.random.key(i))
        mask_panel = (mask if mask is not None
                      else np.zeros(np.asarray(recon).shape, np.float32))
        panels, _ = make_prediction(np.asarray(x), np.asarray(recon),
                                    mask_panel, np.asarray(frames[0]))
        rows.append(panels)
    vz.save_grid_png(os.path.join(_out_dir(root_dir),
                                  f"ARGS={args['arg_num']}-masked-comparison.png"),
                     np.concatenate(rows, axis=0), row_size=6)


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
        recon, frames = jit_with_params(em, lambda mf: lambda xx, k:
            dmod.forward_backward(mf, sched, xx, td, k,
                                  noise_sampler=sampler,
                                  see_whole_sequence="half"))(x, jax.random.key(7))
        mask_panel = (mask if mask is not None
                      else np.zeros(np.asarray(recon).shape, np.float32))
        panels, _ = make_prediction(np.asarray(x), np.asarray(recon),
                                    mask_panel, np.asarray(frames[0]))
        rows.append(panels)
    vz.save_grid_png(os.path.join(_out_dir(root_dir),
                                  f"ARGS={args['arg_num']}-gauss-vs-simplex.png"),
                     np.concatenate(rows, axis=0), row_size=6)


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
    "ano": ano_outputs,
    "gauss_simplex": gauss_simplex_comparison,
    "varying_frequency": varying_frequency,
    "varying_t": gauss_varying_t,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        raise SystemExit(
            f"usage: python -m anoddpm_tpu.figures <ARG_NUM> "
            f"[{'|'.join(GENERATORS)}|all]\n"
            f"       python -m anoddpm_tpu.figures <SIMPLEX_ARG_NUM> "
            f"test_set <GAUSS_ARG_NUM> [anomalous]\n"
            f"       python -m anoddpm_tpu.figures <ARG_NUM> ce "
            f"[train_steps]")
    token = argv[0]
    which = argv[1] if len(argv) > 1 else "all"
    if which == "ce":
        # CE baseline sheet needs only the config (no diffusion checkpoint):
        # trains the working context-encoder, then renders the 5-panel rows
        from .config import load_args
        steps = int(argv[2]) if len(argv) > 2 else 2000
        ce_outputs(load_args(token), ce_train_steps=steps)
        return
    if which == "test_set":
        # Fig-1 needs TWO checkpoints (generate_images.py:554-557 hardcodes
        # args 28/26); here both are CLI tokens
        if len(argv) < 3:
            raise SystemExit("test_set needs a second (gauss) ARG_NUM")
        test_set_outputs(token, argv[2], anomalous="anomalous" in argv[3:])
        return
    args, em, sched = _load_eval_model(".", token)
    targets = GENERATORS if which == "all" else {which: GENERATORS[which]}
    for name, fn in targets.items():
        print(f"generating {name}...", flush=True)
        fn(args, em, sched)


if __name__ == "__main__":
    main()
