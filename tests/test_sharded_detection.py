"""Sample-sharded detection over the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from anoddpm_tpu.config import defaultdict_from_json
from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.parallel.mesh import make_mesh
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import EvalModel


def test_sharded_anomalous_metrics_runs():
    from anoddpm_tpu.detect import sharded_anomalous_metrics
    img = 32
    model = UNet(img_size=img, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, img, img, 1)),
                                 jnp.zeros((1,), jnp.int32))
    em = EvalModel(model, params)
    sched = make_schedule(get_beta_schedule(10, "cosine"))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    args = defaultdict_from_json({
        "arg_num": "shardtest", "img_size": (img, img), "noise_fn": "gauss",
        "dataset": "synthetic", "seed": 0})
    out = sharded_anomalous_metrics(args, em, sched, mesh, t_distance=5,
                                    max_volumes=3)
    # 3 volumes x 4 slices = 12 slices, padded to 16 over 8 devices
    for k in ("dice", "ssim", "iou", "precision", "recall", "fpr", "auc"):
        assert np.isfinite(out[k]), k
    assert 0.0 <= out["auc"] <= 1.0


def test_sharded_metrics_writes_csv(tmp_path):
    import os
    from anoddpm_tpu.detect import sharded_anomalous_metrics
    img = 32
    model = UNet(img_size=img, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, img, img, 1)),
                                 jnp.zeros((1,), jnp.int32))
    em = EvalModel(model, params)
    sched = make_schedule(get_beta_schedule(10, "cosine"))
    args = defaultdict_from_json({
        "arg_num": "shardcsv", "img_size": (img, img), "noise_fn": "gauss",
        "dataset": "synthetic", "seed": 0})
    out = sharded_anomalous_metrics(args, em, sched, make_mesh(),
                                    t_distance=5, max_volumes=2,
                                    root_dir=str(tmp_path))
    csv = os.path.join(str(tmp_path), "metrics", "argsshardcsv.csv")
    assert os.path.exists(csv)
    assert "dice,ssim,iou" in open(csv).read()
    assert "dice_std" in out
