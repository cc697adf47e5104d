"""Training-length probe for the headline (base-64 s2d-2) quality cell
(VERDICT round-3 follow-up on item 1): the seed-replication sweep shows
the AUC gap vs the paper-config anchor is model quality, not sampler
choice (DDIM-15/20/25/35 all land ~.73) — and the training log shows the
s2d64 VLB still falling at epoch 600.  This script RESUMES existing
`256syn64s2d_s{seed}` seeds (copying their params-final into a new
`256syn64s2dL_s{seed}` token) and continues to EPOCHS epochs, so only
the extension is paid for, then evaluates the promoted protocols on the
extended model via the real detect path.

Usage: python scripts/train_longer.py <seed> [epochs=1800]
Appends results to results/train_longer.json (resumable; finished cells
are skipped).
"""
import copy
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

RESULTS = "results/train_longer.json"

PROTOCOLS = {
    "ddim25_eta1": {"sampler": "ddim", "ddim_steps": 25, "ddim_eta": 1.0},
    "ddim15_eta1": {"sampler": "ddim", "ddim_steps": 15, "ddim_eta": 1.0},
    "ddpm200": {"sampler": "ddpm"},
}
METRICS = ("auc", "dice", "ssim", "iou")


def main():
    from anoddpm_tpu.config import load_args
    from anoddpm_tpu.detect import (_load_eval_model,
                                    anomalous_metric_calculation)
    from anoddpm_tpu.train import train

    seed = int(sys.argv[1])
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1800
    src_token = f"256syn64s2d_s{seed}"
    # Epoch target is part of the token so different-length extensions never
    # reuse each other's checkpoints (ADVICE r3).
    token = f"256syn64s2dL{epochs}_s{seed}"

    res = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}

    # Gate on the checkpoint's recorded epoch count, not file existence: the
    # copytree below copies the source params-final, so the file exists long
    # before the extension has actually trained (ADVICE r3, medium).
    final_dir = os.path.join("model", f"diff-params-ARGS={token}",
                             "params-final")
    meta_path = os.path.join(final_dir, "meta.json")
    trained = False
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            trained = json.load(f).get("n_epoch", 0) >= epochs
    if not trained:
        src = os.path.join("model", f"diff-params-ARGS={src_token}")
        dst = os.path.join("model", f"diff-params-ARGS={token}")
        if not os.path.exists(dst):
            shutil.copytree(src, dst)
        args = copy.deepcopy(load_args("256syn64s2d"))
        args["seed"] = seed
        args["train_substeps"] = 8
        args["EPOCHS"] = epochs
        args["arg_num"] = token
        # Resume from the newest interruption checkpoint when one exists,
        # otherwise from the copied params-final (the 600-epoch source).
        ckpt_dir = os.path.join(dst, "checkpoint")
        resume = ("RESUME_RECENT" if os.path.isdir(ckpt_dir)
                  and os.listdir(ckpt_dir) else "RESUME_FINAL")
        print(f"=== extending {src_token} -> {token} ({epochs} epochs, "
              f"{resume})", flush=True)
        train(args, resume=resume)

    for cell, proto in PROTOCOLS.items():
        key = f"s2dL{epochs}_{cell}/seed{seed}"
        if key in res:
            continue
        eval_args, em, sched = _load_eval_model(".", token)
        for k, v in proto.items():
            eval_args[k] = v
        summary = anomalous_metric_calculation(args=eval_args, em=em,
                                               sched=sched)
        res[key] = {m: summary[m] for m in METRICS}
        with open(RESULTS + ".tmp", "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)
        os.replace(RESULTS + ".tmp", RESULTS)
        print(f"=== {key}: AUC {summary['auc']:.4f} "
              f"Dice {summary['dice']:.4f}", flush=True)


if __name__ == "__main__":
    main()
