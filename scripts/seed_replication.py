"""Seed-replicated quality evidence for the two headline cells
(VERDICT.md round-1 item 5; protocol per /root/reference/detection.py:223-250
— lambda=200 partial diffusion on the anomalous set, AUC on raw sq-err,
threshold 0.5 for Dice):

  cell A: paper-config base-128 UNet + full DDPM-200 reverse
  cell B: base-64 s2d-2 UNet + stochastic DDIM-25 (the throughput headline)

Each cell trains >=3 fresh seeds end-to-end through train.train() and
evaluates via the real detect path, writing per-seed numbers + mean/std to
results/seed_replication.json incrementally (safe to resume; finished
seed/cell entries are skipped).

Usage: python scripts/seed_replication.py [seeds...]   (default 0 1 2)
"""
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

RESULTS = "results/seed_replication.json"

CELLS = {
    "paper128_ddpm200": {
        "config": "256syn128",
        "protocol": {"sampler": "ddpm"},
    },
    "s2d64_ddim25_eta1": {
        "config": "256syn64s2d",
        "protocol": {"sampler": "ddim", "ddim_steps": 25, "ddim_eta": 1.0},
    },
}


def load_results():
    if os.path.exists(RESULTS):
        return json.load(open(RESULTS))
    return {}


def save_results(res):
    os.makedirs("results", exist_ok=True)
    with open(RESULTS + ".tmp", "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    os.replace(RESULTS + ".tmp", RESULTS)


def main():
    from anoddpm_tpu.config import load_args
    from anoddpm_tpu.detect import (_load_eval_model,
                                    anomalous_metric_calculation)
    from anoddpm_tpu.train import train

    seeds = [int(s) for s in sys.argv[1:]] or [0, 1, 2]
    res = load_results()

    for cell, spec in CELLS.items():
        for seed in seeds:
            key = f"{cell}/seed{seed}"
            if key in res:
                print(f"skip {key} (done)", flush=True)
                continue
            base = load_args(spec["config"])
            args = copy.deepcopy(base)
            args["seed"] = seed
            # fuse 8 optimizer steps per dispatch (the production
            # train_substeps path — ~28 ms relay overhead amortised away,
            # BENCHNOTES round-2 table)
            args["train_substeps"] = 8
            token = f"{spec['config']}_s{seed}"
            args["arg_num"] = token

            final = os.path.join("model", f"diff-params-ARGS={token}",
                                 "params-final", "payload.msgpack")
            if not os.path.exists(final):
                print(f"=== training {key} ({args['EPOCHS']} epochs)",
                      flush=True)
                train(args)

            eval_args, em, sched = _load_eval_model(".", token)
            for k, v in spec["protocol"].items():
                eval_args[k] = v
            summary = anomalous_metric_calculation(args=eval_args, em=em,
                                                   sched=sched)
            res[key] = {k: summary[k] for k in
                        ("auc", "dice", "ssim", "iou")}
            save_results(res)
            print(f"=== {key}: AUC {summary['auc']:.4f} "
                  f"Dice {summary['dice']:.4f}", flush=True)

    # aggregate mean +- std per cell
    for cell in CELLS:
        vals = {m: [res[f"{cell}/seed{s}"][m] for s in seeds
                    if f"{cell}/seed{s}" in res]
                for m in ("auc", "dice", "ssim", "iou")}
        if not vals["auc"]:
            continue
        res[f"{cell}/aggregate"] = {
            m: {"mean": float(np.mean(v)), "std": float(np.std(v)),
                "n": len(v)}
            for m, v in vals.items()}
        a = res[f"{cell}/aggregate"]
        print(f"{cell}: AUC {a['auc']['mean']:.4f}+-{a['auc']['std']:.4f}  "
              f"Dice {a['dice']['mean']:.4f}+-{a['dice']['std']:.4f}  "
              f"(n={a['auc']['n']})", flush=True)
    save_results(res)


if __name__ == "__main__":
    main()
