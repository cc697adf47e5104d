"""Probe the flagship trainer's wall-clock per epoch at different
train_substeps fusion levels (round-5: the round-4 flagship ran 8.2 s/epoch
while the pure step compute is ~2 s/epoch — if the gap is per-dispatch relay
overhead, deeper substep fusion reclaims it for the 3000-epoch campaign).

usage: python scripts/substep_probe.py [substeps ...]   (default: 4 8 16)
Appends one JSON line per setting to results/substep_probe.jsonl.
"""
import copy
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

EPOCHS = 16


def main():
    from anoddpm_tpu.config import load_args
    from anoddpm_tpu.train import train

    settings = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "substep_probe.jsonl")
    for s in settings:
        args = copy.deepcopy(load_args("256syn128"))
        args["EPOCHS"] = EPOCHS
        args["train_substeps"] = s
        args["skip_test_eval"] = True
        args["checkpoint_every"] = 10_000   # no checkpoints in the probe
        walls = []
        for rep in range(2):   # rep 0 pays the compiles; rep 1 is steady
            root = tempfile.mkdtemp(prefix=f"substep_probe_{s}_")
            try:
                t0 = time.time()
                train(args, root_dir=root, max_epochs=EPOCHS)
                walls.append(time.time() - t0)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        row = {"substeps": s, "epochs": EPOCHS,
               "sec_per_epoch_cold": round(walls[0] / EPOCHS, 2),
               "sec_per_epoch": round(walls[1] / EPOCHS, 2),
               "wall": [round(w, 1) for w in walls]}
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
