"""Round-5 VERDICT item 5: dense per-lambda curves over the FULL anomalous
set at production defaults (reference: detection.py:344-428 walks every
anomalous volume; round 4 covered exactly one).

Checkpoints are transient across rounds (model/ is gitignored), so this
trains the production base-64 s2d config fresh on-chip when absent, then
drives `graph_data` with the dense grid at a documented STEP=25 coarsening
(wall-clock bound: 40 lambdas x 22 volumes ride the batch axis, vs 1000 x 22
for step 1 — the step-1 single-volume evidence from round 4 stands
alongside), auto-sized lambda_batch, on the real chip.

usage: python scripts/dense_sweep_campaign.py [step] [vols]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

TOKEN = "256syn64s2d"
RESULTS = "results/dense_sweep_full.json"


def main():
    from anoddpm_tpu.config import load_args
    from anoddpm_tpu.detect import graph_data
    from anoddpm_tpu.train import train

    step = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    vols = int(sys.argv[2]) if len(sys.argv) > 2 else 22

    res = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    args = load_args(TOKEN)
    args["skip_test_eval"] = True

    meta_path = os.path.join("model", f"diff-params-ARGS={TOKEN}",
                             "params-final", "meta.json")
    if not os.path.exists(meta_path):
        ckpt_dir = os.path.join("model", f"diff-params-ARGS={TOKEN}",
                                "checkpoint")
        resume = "RESUME_RECENT" if (os.path.isdir(ckpt_dir)
                                     and os.listdir(ckpt_dir)) else None
        t0 = time.time()
        train(args, resume=resume)
        res["train_seconds"] = time.time() - t0
        res["train_epochs"] = int(args["EPOCHS"])
        with open(RESULTS, "w") as f:
            json.dump(res, f, indent=1)

    t0 = time.time()
    graph_data(token=TOKEN, dense=True, lambda_step=step, max_volumes=vols)
    res["sweep_seconds"] = time.time() - t0
    res["lambda_step"] = step
    res["volumes"] = vols
    csv_dir = os.path.join("metrics", f"ARGS={TOKEN}")
    res["csv_files"] = sorted(f for f in os.listdir(csv_dir)
                              if f.endswith(".csv"))
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
