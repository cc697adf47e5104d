"""DDPM full-chain vs DDIM-strided anomaly metrics on a trained checkpoint.

Usage: python scripts/quality_compare.py <ARG_NUM> [ddim_steps...]
Validates the accelerated protocol's quality parity (AUC/Dice).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anoddpm_tpu.detect import _load_eval_model, anomalous_metric_calculation


def main():
    token = sys.argv[1]
    step_counts = [int(s) for s in sys.argv[2:]] or [25]
    bundle = _load_eval_model(".", token)
    args, em, sched = bundle

    results = {}
    args_ddpm = dict(args)
    base = anomalous_metric_calculation(args=args, em=em, sched=sched)
    results["ddpm_full"] = base

    for s in step_counts:
        args["sampler"] = "ddim"
        args["ddim_steps"] = s
        res = anomalous_metric_calculation(args=args, em=em, sched=sched)
        results[f"ddim_{s}"] = res

    print(json.dumps({k: {m: round(v[m], 4) for m in
                          ("auc", "dice", "ssim", "iou")}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
