"""Smoke-run the FULL training recipe (train.train) on a tiny config:
both snapshot artifact kinds (the epoch%100 sample_p grid and the
epoch%50 x_t/eps-hat grid — diffusion_training.py:211-235), the final
checkpoint, the metrics JSONL, and the post-train test-set eval."""
import glob
import os

import numpy as np

from anoddpm_tpu.config import defaultdict_from_json


def test_train_recipe_smoke(tmp_path):
    from anoddpm_tpu.train import train

    args = defaultdict_from_json({
        "arg_num": "smoketrain",
        "img_size": [32, 32],
        "Batch_Size": 2,
        "EPOCHS": 50,
        "T": 10,
        "base_channels": 32,
        "channel_mults": [1, 2],
        "attention_resolutions": "16",
        "beta_schedule": "cosine",
        "loss-type": "l2",
        "lr": 1e-4,
        "sample_distance": 8,
        "train_start": True,
        "noise_fn": "gauss",
        "dataset": "synthetic",
        "iters_per_epoch": 1,
        "save_imgs": True,
        "save_vids": False,
        "seed": 0,
    })
    root = str(tmp_path)
    state = train(args, root_dir=root, max_epochs=50)
    assert int(state.step) == 51  # epochs 0..50, 1 iter each

    img_dir = os.path.join(root, "diffusion-training-images",
                           "ARGS=smoketrain")
    # epoch 0 -> %100 cadence: real/sample/pred_x_0 grid (sample_snapshot);
    # epoch 50 -> alternate cadence: real/x_t/eps-hat/mse (training_snapshot)
    assert os.path.exists(os.path.join(img_dir, "EPOCH=0.png"))
    assert os.path.exists(os.path.join(img_dir, "EPOCH=50.png"))

    assert os.path.exists(os.path.join(
        root, "model", "diff-params-ARGS=smoketrain", "params-final",
        "payload.msgpack"))
    jsonl = os.path.join(root, "metrics", "argssmoketrain-train.jsonl")
    assert os.path.exists(jsonl)
    assert len(open(jsonl).read().strip().splitlines()) >= 5
    # test-set eval artifact from the final testing() call
    assert glob.glob(os.path.join(root, "metrics", "*smoketrain*test*")) or \
        glob.glob(os.path.join(root, "metrics", "argssmoketrain*.json"))


def test_train_recipe_on_mesh_with_resume(tmp_path, monkeypatch):
    """Full train.train() dress rehearsal on the virtual 8-device mesh
    (VERDICT round-2 item 3): prefetcher + fused substeps + checkpoint under
    sharding, interrupted and restarted with RESUME_RECENT — the restore
    path re-enters the sharded step from a replicated-spec target
    (diffusion_training.py:273-284, :363-377 resume contract).

    Leg 1 simulates a crash after the epoch-2 periodic checkpoint: the
    final save, checkpoint purge and post-train testing are patched out
    (a completed run purges checkpoint/ — diffusion_training.py:382-385 —
    which would leave RESUME_RECENT nothing to restore)."""
    import anoddpm_tpu.train as T
    from anoddpm_tpu.parallel.mesh import make_mesh
    from anoddpm_tpu.train import train

    args = defaultdict_from_json({
        "arg_num": "meshtrain",
        "img_size": [32, 32],
        "Batch_Size": 8,          # 1 sample per device
        "EPOCHS": 6,
        "T": 10,
        "base_channels": 32,
        "channel_mults": [1, 2],
        "attention_resolutions": "16",
        "beta_schedule": "cosine",
        "loss-type": "l2",
        "lr": 1e-4,
        "sample_distance": 8,
        "train_start": True,
        "noise_fn": "simplex",    # production corruption, sharded on-device
        "dataset": "synthetic",
        "iters_per_epoch": 2,
        "train_substeps": 2,      # fused dispatch path under the mesh
        "checkpoint_every": 2,
        "save_imgs": False,
        "save_vids": False,
        "seed": 0,
    })
    root = str(tmp_path)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    # leg 1: run past the epoch-2 checkpoint boundary, then "crash" (no
    # final save, no purge, no test-suite eval)
    real_save = T.save_checkpoint
    with monkeypatch.context() as m:
        m.setattr(T, "save_checkpoint",
                  lambda *a, **k: None if k.get("final")
                  else real_save(*a, **k))
        m.setattr(T, "purge_checkpoints", lambda *a, **k: None)
        m.setattr(T.ev, "testing", lambda *a, **k: {})
        train(args, root_dir=root, mesh=mesh, max_epochs=3)
    ckpt_dir = os.path.join(root, "model", "diff-params-ARGS=meshtrain",
                            "checkpoint")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # leg 2: RESUME_RECENT restart on the mesh, run to completion
    state = train(args, root_dir=root, mesh=mesh, resume="RESUME_RECENT",
                  max_epochs=6)
    import jax
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
    final = os.path.join(root, "model", "diff-params-ARGS=meshtrain",
                         "params-final", "payload.msgpack")
    assert os.path.exists(final)
    jsonl = os.path.join(root, "metrics", "argsmeshtrain-train.jsonl")
    assert os.path.exists(jsonl)
