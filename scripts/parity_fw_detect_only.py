"""Detect-only leg of the framework parity cell (scripts/parity_vs_reference.py).

Used when a cell's training already completed (params-final exists in the
cell workdir) but the lambda=200 headline detection still needs to run —
e.g. to finish a CPU-trained cell's evaluation on the TPU chip, where the
200-step reverse-chain compiles in minutes instead of hours.  Metric
parity is device-independent (the checkpoint is the cell's own); timing
fields record which device produced them.

usage: python scripts/parity_fw_detect_only.py <config_key> [train_seconds]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from parity_vs_reference import CONFIGS, _merge, workdir_for  # noqa: E402


def main():
    config_key = sys.argv[1]
    train_s = float(sys.argv[2]) if len(sys.argv) > 2 else None
    cfg = dict(CONFIGS[config_key])

    from anoddpm_tpu.detect import (_load_eval_model,
                                    anomalous_metric_calculation)
    import jax

    wd = workdir_for(cfg)
    token = f"{cfg['arg_num']}fw"
    os.chdir(wd)
    eval_args, em, sched = _load_eval_model(wd, token)
    t0 = time.time()
    summary = anomalous_metric_calculation(args=eval_args, em=em,
                                           sched=sched, root_dir=wd)
    detect_s = time.time() - t0
    row = {k: v for k, v in summary.items()}
    row.update(detect_seconds=detect_s, epochs=cfg["EPOCHS"],
               impl="anoddpm-tpu", detect_device=jax.default_backend())
    if train_s is not None:
        row["train_seconds"] = train_s
    _merge({f"{config_key}/framework": row})
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
