"""Flagship-config quality campaign (round-4 VERDICT item 2).

BASELINE.md graduated config 3 — the true paper architecture
(256^2, base 128, attention "16,8", heads 2, T=1000 linear, simplex octave-6
freq-64, sample_distance 800; /root/reference/test_args/args28.json) — has
only ever been THROUGHPUT-measured; every quality number so far came from
base-64 proxies.  This script trains it on-chip at a budget-scaled epoch
count (configs/args256syn128.json) and produces the full quality evidence
at the flagship architecture:

  1. train (resume-aware: gated on the checkpoint's recorded n_epoch)
  2. headline eval, DDPM lambda=200 (the reference protocol,
     detection.py:156-287) AND DDIM-15 eta1 (production sampler)
     -> metrics/args256syn128.csv + results/flagship_quality.json
  3. test-set suite -> metrics/args256syn128-test.json
     (evaluation.py:90-186 counterpart)
  4. a 256^2 figures drive (ano sheets + masked comparison)

usage: python scripts/flagship_campaign.py [epochs] [--skip-figures]
"""

import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

TOKEN = "256syn128"
RESULTS = "results/flagship_quality.json"
PROTOCOLS = {
    "ddpm200": {"sampler": "ddpm"},
    "ddim15_eta1": {"sampler": "ddim", "ddim_steps": 15, "ddim_eta": 1.0},
}
METRICS = ("auc", "dice", "ssim", "iou", "precision", "recall", "fpr")


def _save(res):
    os.makedirs("results", exist_ok=True)
    with open(RESULTS + ".tmp", "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    os.replace(RESULTS + ".tmp", RESULTS)


def main():
    from anoddpm_tpu.config import load_args
    from anoddpm_tpu.detect import (_load_eval_model,
                                    anomalous_metric_calculation)
    from anoddpm_tpu.train import train

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else None
    protos = dict(PROTOCOLS)
    for a in sys.argv[1:]:
        if a.startswith("--protocols="):
            names = a.split("=", 1)[1].split(",")
            unknown = [n for n in names if n not in PROTOCOLS]
            if unknown:
                raise SystemExit(f"unknown protocol(s) {unknown}; "
                                 f"known: {sorted(PROTOCOLS)}")
            protos = {k: v for k, v in PROTOCOLS.items() if k in names}
    res = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}

    args = copy.deepcopy(load_args(TOKEN))
    if epochs:
        args["EPOCHS"] = epochs
    target = int(args["EPOCHS"])
    # substep fusion level (dispatch-overhead amortisation; semantics-
    # neutral — jit_multi_step runs the same sequential optimizer steps).
    # Default 4 = round-4 setting; the round-5 queue sets the probe winner
    # (scripts/substep_probe.py -> results/substep_probe.jsonl).
    args["train_substeps"] = int(os.environ.get("FLAGSHIP_SUBSTEPS", "4"))
    # the campaign runs its own evaluation.testing cell below; the train
    # tail's would double the VLB sweep on every staged slice
    args["skip_test_eval"] = True

    # 1. train, gated on the checkpoint's recorded epoch count.  Staged
    # campaigns (round-4 VERDICT item 2: 600 -> 1500 -> 3000) resume from
    # params-final when it records fewer epochs than the target; an
    # interrupted slice resumes from its newest periodic checkpoint.
    meta_path = os.path.join("model", f"diff-params-ARGS={TOKEN}",
                             "params-final", "meta.json")
    recorded = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            recorded = int(json.load(f).get("n_epoch", 0))
    if recorded < target:
        ckpt_dir = os.path.join("model", f"diff-params-ARGS={TOKEN}",
                                "checkpoint")
        if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
            resume = "RESUME_RECENT"
        elif recorded > 0:
            resume = "RESUME_FINAL"
        else:
            resume = None
        t0 = time.time()
        train(args, resume=resume)
        # wall seconds of THIS slice (epochs recorded..target); totals are
        # the sum of the train_seconds@* entries (+ the legacy 600-epoch
        # "train_seconds" if present)
        res[f"train_seconds@{target}"] = time.time() - t0
        res[f"train_slice@{target}"] = [recorded, target]
        res["train_epochs"] = target
        _save(res)

    # 2. headline eval under the selected samplers, keyed by epoch budget
    for cell, proto in protos.items():
        key = f"flagship_{cell}@{target}"
        if key in res or (target == 600 and f"flagship_{cell}" in res):
            continue
        eval_args, em, sched = _load_eval_model(".", TOKEN)
        for k, v in proto.items():
            eval_args[k] = v
        t0 = time.time()
        summary = anomalous_metric_calculation(args=eval_args, em=em,
                                               sched=sched)
        res[key] = {m: summary[m] for m in METRICS}
        res[key]["eval_seconds"] = time.time() - t0
        _save(res)
        print(f"=== {key}: AUC {summary['auc']:.4f} "
              f"Dice {summary['dice']:.4f}", flush=True)

    # 3. test-set suite (videos off: protocol numbers, not artifacts)
    if "--skip-testing" not in sys.argv and f"testing@{target}" not in res:
        from anoddpm_tpu.data.datasets import dataset_from_args
        from anoddpm_tpu.data.pipeline import batch_iterator
        from anoddpm_tpu.evaluation import testing
        from anoddpm_tpu.ops.noise import sampler_from_args
        eval_args, em, sched = _load_eval_model(".", TOKEN)
        eval_args["vlb_batch_mean"] = True
        ds = dataset_from_args(".", eval_args, train=False)
        it = batch_iterator(ds, 4, shuffle=True, seed=2)
        out = testing(it, em, sched, eval_args,
                      noise_sampler=sampler_from_args(eval_args),
                      n_images=16, save_videos=False)
        res[f"testing@{target}"] = {k: round(float(v), 5)
                                    for k, v in out.items()}
        _save(res)

    # 4. figures drive at the flagship resolution
    if "--skip-figures" not in sys.argv and "figures_done" not in res:
        from anoddpm_tpu import figures as F
        eval_args, em, sched = _load_eval_model(".", TOKEN)
        F.ano_outputs(eval_args, em, sched, n_attempts=1, rows=2,
                      t_distance=250)
        F.masked_comparison(eval_args, em, sched, t_distance=250)
        res["figures_done"] = True
        _save(res)

    print(json.dumps({k: v for k, v in res.items()
                      if k.startswith("flagship_")}, indent=1))


if __name__ == "__main__":
    main()
