"""Calibrate the diffuse-lesion severity so the harder regime is hard
but *informative* (VERDICT round-2 item 5).

The first-cut diffuse family (severity 1.0 pre-retune: offset floor 0.12,
strength 0.55-0.85) scored AUC ~.47-.51 with Dice ~0 for EVERY method
(results/seed_replication_r3.log) — in-distribution lesions are
undetectable in principle and rank nothing.  This script sweeps the
severity knob on one trained seed under the cheap DDIM-15 protocol and
reports AUC/Dice per severity; pick the smallest severity whose simplex
AUC clears ~0.65 (clearly above chance, still well below the bump
family's ~.73-.75) and wire it into scripts/seed_replication.py's
`_diffuse` protocol cells and the diffuse 3-way ROC.

Usage: python scripts/diffuse_calibration.py [severities...]
Appends to results/diffuse_calibration.json (resumable).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

RESULTS = "results/diffuse_calibration.json"
TOKEN = "256syn64s2d_s1"
METRICS = ("auc", "dice", "ssim", "iou")


def main():
    from anoddpm_tpu.detect import (_load_eval_model,
                                    anomalous_metric_calculation)

    severities = [float(s) for s in sys.argv[1:]] or [1.0, 1.5, 2.0, 2.5]
    res = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    for sev in severities:
        key = f"ddim15_eta1_diffuse_sev{sev:g}"
        if key in res:
            continue
        eval_args, em, sched = _load_eval_model(".", TOKEN)
        eval_args.update({"sampler": "ddim", "ddim_steps": 15,
                          "ddim_eta": 1.0, "lesion_kind": "diffuse",
                          "lesion_severity": sev})
        summary = anomalous_metric_calculation(args=eval_args, em=em,
                                               sched=sched)
        res[key] = {m: summary[m] for m in METRICS}
        with open(RESULTS + ".tmp", "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)
        os.replace(RESULTS + ".tmp", RESULTS)
        print(f"=== severity {sev:g}: AUC {summary['auc']:.4f} "
              f"Dice {summary['dice']:.4f}", flush=True)


if __name__ == "__main__":
    main()
