"""Quality-parity across model sizes and samplers at 256^2 (synthetic
anomalies): does a base-64 UNet + DDIM match the paper-config base-128 +
full DDPM on AUC/Dice?  Evidence for right-sizing the throughput headline.

Usage: python scripts/model_size_quality.py <token> [<token>...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anoddpm_tpu.detect import _load_eval_model, anomalous_metric_calculation

PROTOCOLS = [
    ("ddpm200", {"sampler": "ddpm"}),
    ("ddim25_eta1", {"sampler": "ddim", "ddim_steps": 25, "ddim_eta": 1.0}),
    ("ddim15_eta1", {"sampler": "ddim", "ddim_steps": 15, "ddim_eta": 1.0}),
]


def main():
    results = {}
    for token in sys.argv[1:]:
        args, em, sched = _load_eval_model(".", token)
        for pname, overrides in PROTOCOLS:
            for k, v in overrides.items():
                args[k] = v
            r = anomalous_metric_calculation(args=args, em=em, sched=sched)
            results[f"{token}/{pname}"] = {
                m: round(r[m], 4) for m in ("auc", "dice", "ssim", "iou")}
            print(json.dumps(results, indent=1), flush=True)
    with open("metrics/model_size_quality.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
