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


def test_sharded_metrics_chunked_non_divisible(tmp_path):
    """VERDICT #10: a slice count that is neither a multiple of the mesh
    size nor of the chunk size streams through in wrap-padded fixed-shape
    chunks and yields the same summary as one monolithic dispatch."""
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
    args = defaultdict_from_json({
        "arg_num": "chunktest", "img_size": (img, img), "noise_fn": "gauss",
        "dataset": "synthetic", "seed": 0})
    # 5 volumes x 4 slices = 20 slices; chunk_per_device=1 -> chunks of 8:
    # dispatches of 8/8/8(wrap-padded by 4)
    small = sharded_anomalous_metrics(args, em, sched, mesh, t_distance=5,
                                      max_volumes=5, chunk_per_device=1,
                                      root_dir=str(tmp_path))
    big = sharded_anomalous_metrics(args, em, sched, mesh, t_distance=5,
                                    max_volumes=5, chunk_per_device=100,
                                    root_dir=str(tmp_path))
    for k in ("dice", "ssim", "iou", "auc"):
        assert np.isfinite(small[k]), k
        # different per-chunk PRNG keys -> reconstructions differ, but the
        # summary statistics must agree to sampling noise
        assert abs(small[k] - big[k]) < 0.25, (k, small[k], big[k])


def test_batched_metrics_match_scalar_oracle():
    """metrics.batched_anomaly_metrics == the per-slice scalar functions."""
    from anoddpm_tpu import metrics as M
    rng = np.random.default_rng(0)
    s, h, w = 5, 24, 24
    real = rng.uniform(-1, 1, (s, h, w, 1))
    recon = np.clip(real + rng.normal(0, 0.45, (s, h, w, 1)), -1, 1)
    mask = (rng.uniform(0, 1, (s, h, w, 1)) < 0.1).astype(np.float32)
    out = M.batched_anomaly_metrics(real, recon, mask)
    for i in range(s):
        mse_raw = M.square_error(real[i], recon[i])
        pred = (mse_raw > 0.5).astype(np.float32)
        np.testing.assert_allclose(
            out["auc"][i], M.roc_auc_score(mask[i].astype(np.uint8), mse_raw),
            atol=1e-10)
        np.testing.assert_allclose(
            out["dice"][i], M.dice_coeff(real[i], recon[i], mask[i], mse=pred),
            atol=1e-6)
        np.testing.assert_allclose(
            out["ssim"][i], M.ssim(real[i], recon[i], channel_axis=2),
            atol=1e-10)
        np.testing.assert_allclose(out["iou"][i], M.iou(mask[i], pred),
                                   atol=1e-8)
        np.testing.assert_allclose(out["precision"][i],
                                   M.precision(mask[i], pred), atol=1e-8)
        np.testing.assert_allclose(out["recall"][i],
                                   M.recall(mask[i], pred), atol=1e-8)
        np.testing.assert_allclose(out["fpr"][i], M.fpr(mask[i], pred),
                                   atol=1e-8)


def test_batched_auc_degenerate_mask_no_nan():
    """All-negative (and all-positive) masks must yield 0.0 like the scalar
    roc_curve path (P/N clamped), never NaN-poison the summary."""
    from anoddpm_tpu import metrics as M
    rng = np.random.default_rng(1)
    scores = rng.uniform(0, 1, (3, 8, 8, 1))
    mask = np.zeros((3, 8, 8, 1))
    mask[1, 2:4, 2:4] = 1.0   # slice 1 normal, slices 0/2 lesion-free
    out = M.batched_roc_auc(mask.astype(np.uint8), scores)
    assert np.isfinite(out).all()
    assert out[0] == 0.0 and out[2] == 0.0
    np.testing.assert_allclose(
        out[1], M.roc_auc_score(mask[1].astype(np.uint8), scores[1]),
        atol=1e-12)
