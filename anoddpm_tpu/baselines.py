"""Baseline drivers: context-encoder training + anomaly evaluation
(the working counterpart of the reference's gan_anomalous / ce_sliding_window
paths, detection.py:683-920, whose model code is absent from the reference
repo).

CLI: ``python -m anoddpm_tpu.baselines <ARG_NUM> [steps]`` — trains the CE
on the config's healthy dataset, evaluates sliding-window reconstruction
error on the anomalous set, writes metrics/args{n}-ce.csv and returns the
ROC curve for roc_data comparisons.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import metrics as M
from .config import load_args
from .data.datasets import anomalous_dataset_from_args, dataset_from_args
from .data.pipeline import batch_iterator
from .models.context_encoder import (ContextEncoder, make_ce_train_step,
                                     sliding_window_error)


def train_context_encoder(args, root_dir: str = ".", steps: int = 2000,
                          batch_size: int = 16, base_channels: int = 32,
                          lr: float = 2e-3, seed: int = 0):
    """Train the inpainting baseline on the healthy dataset."""
    model = ContextEncoder(base_channels=base_channels)
    ds = dataset_from_args(root_dir, args, train=True)
    loader = batch_iterator(ds, batch_size, shuffle=True, seed=seed)
    sample = next(loader)["image"]
    params = jax.jit(model.init)(
        jax.random.key(seed), jnp.asarray(sample),
        jnp.zeros(sample.shape[:3] + (1,)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = make_ce_train_step(model, tx)
    key = jax.random.key(seed + 1)
    loss = float("nan")
    for i in range(steps):
        key, sub = jax.random.split(key)
        batch = jnp.asarray(next(loader)["image"])
        params, opt_state, loss = step(params, opt_state, batch, sub)
        if i % max(steps // 10, 1) == 0:
            print(f"CE step {i}: masked-recon loss {float(loss):.5f}",
                  flush=True)
    print(f"CE final loss {float(loss):.5f}")
    return model, params


def ce_anomalous_metrics(model, params, args, root_dir: str = ".",
                         window: int = 4,
                         max_volumes: Optional[int] = None
                         ) -> Tuple[Dict[str, float], Tuple]:
    """Sliding-window anomaly metrics + pooled pixel ROC curve."""
    d_set = anomalous_dataset_from_args(root_dir, args)
    n = len(d_set) if max_volumes is None else min(len(d_set), max_volumes)
    swe = jax.jit(lambda x: sliding_window_error(model, params, x, window))
    totals = {k: [] for k in ("dice", "iou", "precision", "recall", "fpr",
                              "auc")}
    all_scores, all_labels = [], []
    for i in range(n):
        sample = d_set[i]
        images = jnp.asarray(sample["image"])
        masks = np.asarray(sample["mask"])
        err = np.asarray(swe(images))
        for s in range(images.shape[0]):
            pred = (err[s] > 0.5).astype(np.float32)
            totals["auc"].append(M.roc_auc_score(masks[s].astype(np.uint8),
                                                 err[s]))
            totals["dice"].append(M.dice_coeff(None, None, masks[s],
                                               mse=pred))
            totals["precision"].append(M.precision(masks[s], pred))
            totals["recall"].append(M.recall(masks[s], pred))
            totals["iou"].append(M.iou(masks[s], pred))
            totals["fpr"].append(M.fpr(masks[s], pred))
            all_scores.append(err[s].reshape(-1))
            all_labels.append(masks[s].reshape(-1))

    summary = {}
    for k, v in totals.items():
        summary[k] = float(np.mean(v))
        summary[k + "_std"] = float(np.std(v))
    roc = M.roc_curve(np.concatenate(all_labels), np.concatenate(all_scores))

    metrics_dir = os.path.join(root_dir, "metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    with open(os.path.join(metrics_dir, f"args{args['arg_num']}-ce.csv"),
              "w") as f:
        f.write("dice,iou,precision,recall,fpr,auc\n")
        for k in ("dice", "iou", "precision", "recall", "fpr", "auc"):
            f.write(f"{summary[k]:.4f} +- {summary[k + '_std']:.4f},")
        f.write("\n")
    return summary, roc


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        raise SystemExit("usage: python -m anoddpm_tpu.baselines <ARG_NUM> "
                         "[train_steps]")
    args = load_args(argv[0])
    steps = int(argv[1]) if len(argv) > 1 else 2000
    model, params = train_context_encoder(args, steps=steps)
    summary, _ = ce_anomalous_metrics(model, params, args)
    print("CE baseline:", {k: round(v, 4) for k, v in summary.items()
                           if not k.endswith("_std")})


if __name__ == "__main__":
    main()
