"""The minimum end-to-end slice (SURVEY.md §7 step 4): train a few steps on
synthetic data, checkpoint round-trip, partial-diffusion detection with
metrics — all through the real train/detect code paths, on CPU with tiny
shapes.  Also exercises the data-parallel path on the virtual 8-device
mesh."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu import diffusion as dm
from anoddpm_tpu.checkpoint import (load_checkpoint, load_parameters,
                                    save_checkpoint)
from anoddpm_tpu.config import load_args
from anoddpm_tpu.data.synthetic import (SyntheticAnomalyDataset,
                                        SyntheticMRIDataset)
from anoddpm_tpu.models.unet import UNet
from anoddpm_tpu.ops.noise import make_noise_sampler
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule
from anoddpm_tpu.training import (init_train_state, jit_train_step,
                                  make_eval_model_fn, make_optimizer,
                                  make_train_step)

IMG = 32
T = 10


@pytest.fixture(scope="module")
def setup():
    model = UNet(img_size=IMG, base_channels=32, in_channels=1,
                 channel_mults=(1, 2), attention_resolutions="16")
    # cosine: valid at tiny T (linear's 1000/T scaling pushes beta past 1
    # below T~50 — a property inherited from the reference formula)
    sched = make_schedule(get_beta_schedule(T, "cosine"))
    tx = make_optimizer(1e-4)
    state = jax.jit(lambda k: init_train_state(model, tx, k, (2, IMG, IMG, 1)))(
        jax.random.key(0))
    return model, sched, tx, state


def test_train_step_reduces_loss_shape(setup):
    model, sched, tx, state = setup
    # the jitted step donates its input state; work on a copy so the
    # module-scoped fixture state stays alive for the other tests
    state = jax.tree_util.tree_map(jnp.copy, state)
    step = jit_train_step(make_train_step(model, sched, tx,
                                          make_noise_sampler("gauss"),
                                          max_t=T))
    ds = SyntheticMRIDataset(img_size=(IMG, IMG), length=8)
    batch = np.stack([ds[i]["image"] for i in range(2)])
    key = jax.random.key(1)
    losses = []
    for _ in range(3):
        state, metrics = step(state, jnp.asarray(batch), key)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # EMA must track but differ from params after updates
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert p.shape == e.shape


def test_checkpoint_roundtrip(tmp_path, setup):
    model, sched, tx, state = setup
    args = {"arg_num": "t1", "img_size": (IMG, IMG)}
    save_checkpoint(str(tmp_path), args, 5, state.params, state.ema_params,
                    state.opt_state)
    save_checkpoint(str(tmp_path), args, 7, state.params, state.ema_params,
                    state.opt_state)
    target = {"model": state.params, "ema": state.ema_params,
              "opt": state.opt_state}
    payload, meta = load_checkpoint(str(tmp_path), "t1", use_checkpoint=True,
                                    target_payload=target)
    assert meta["n_epoch"] == 7
    orig = jax.tree_util.tree_leaves(state.params)
    restored = jax.tree_util.tree_leaves(payload["model"])
    for a, b in zip(orig, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # args travel inside the checkpoint
    save_checkpoint(str(tmp_path), args, 9, state.params, state.ema_params,
                    state.opt_state, final=True)
    args2, payload2, meta2 = load_parameters(str(tmp_path), "t1",
                                             target_payload=target)
    assert args2["arg_num"] == "t1"
    assert tuple(args2["img_size"]) == (IMG, IMG)


def test_corrupt_checkpoint_skipped(tmp_path, setup):
    model, sched, tx, state = setup
    args = {"arg_num": "t2", "img_size": (IMG, IMG)}
    save_checkpoint(str(tmp_path), args, 1, state.params, state.ema_params,
                    state.opt_state)
    save_checkpoint(str(tmp_path), args, 2, state.params, state.ema_params,
                    state.opt_state)
    # corrupt the newest
    p = os.path.join(str(tmp_path), "model", "diff-params-ARGS=t2",
                     "checkpoint", "diff_epoch=2", "payload.msgpack")
    with open(p, "wb") as f:
        f.write(b"garbage")
    payload, meta = load_checkpoint(str(tmp_path), "t2", use_checkpoint=True)
    assert meta["n_epoch"] == 1  # fell back to the older checkpoint


def test_detection_metrics_on_synthetic(setup):
    model, sched, tx, state = setup
    from anoddpm_tpu.detect import evaluate_anomaly_batch
    from anoddpm_tpu.training import EvalModel
    em = EvalModel(model, state.ema_params)
    ds = SyntheticAnomalyDataset(img_size=(IMG, IMG), length=1)
    sample = ds[0]
    out, recon = evaluate_anomaly_batch(
        em, sched, sample["image"], sample["mask"], jax.random.key(2),
        make_noise_sampler("gauss"), t_distance=5)
    for k, v in out.items():
        assert len(v) == 4, k
        assert np.isfinite(v).all(), k
    assert recon.shape == sample["image"].shape
    assert all(0.0 <= a <= 1.0 for a in out["auc"])


def test_data_parallel_step_on_virtual_mesh(setup):
    model, sched, tx, state = setup
    state = jax.tree_util.tree_map(jnp.copy, state)
    from anoddpm_tpu.parallel.mesh import make_mesh, shard_batch
    mesh = make_mesh()
    assert mesh.devices.size == 8
    step = jit_train_step(make_train_step(model, sched, tx,
                                          make_noise_sampler("gauss"),
                                          max_t=T), mesh=mesh)
    ds = SyntheticMRIDataset(img_size=(IMG, IMG), length=16)
    batch = np.stack([ds[i]["image"] for i in range(16)])
    sharded = shard_batch(jnp.asarray(batch), mesh)
    state2, metrics = step(state, sharded, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_config_loader():
    args = load_args("_smoke64", config_dir="configs")
    assert args["arg_num"] == "_smoke64"
    assert args["img_size"] == (64, 64)
    assert args["missing_key"] == ""  # defaultdict-str semantics
    assert args["compute_dtype"] == "float32"


def test_config_unknown_key_warns(tmp_path):
    """Typo'd config keys warn instead of silently defaulting to ""
    (config.validate_args against KNOWN_KEYS)."""
    import json
    import warnings
    cfg = {"img_size": [64, 64], "Batch_Size": 1, "samle_distance": 100}
    (tmp_path / "args9.json").write_text(json.dumps(cfg))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        args = load_args("9", config_dir=str(tmp_path))
    assert any("samle_distance" in str(w.message) for w in caught)
    assert args["samle_distance"] == 100  # still passes through

    # every shipped config must be warning-free
    import glob
    from anoddpm_tpu.config import validate_args
    for p in glob.glob("configs/*.json"):
        assert validate_args(json.load(open(p)), source=p) == [], p


def test_multi_step_equivalence_single(setup):
    """multi_step with K=1 must advance state identically to one plain
    train_step call given the same derived key."""
    from anoddpm_tpu.training import make_multi_step
    model, sched, tx, state = setup
    step = make_train_step(model, sched, tx, make_noise_sampler("gauss"),
                           max_t=T)
    multi = make_multi_step(step, 1)
    ds = SyntheticMRIDataset(img_size=(IMG, IMG), length=4)
    batch = jnp.asarray(np.stack([ds[i]["image"] for i in range(2)]))
    key = jax.random.key(9)
    s_a, m_a = jax.jit(step)(jax.tree_util.tree_map(jnp.copy, state), batch,
                             jax.random.split(key)[1])
    s_b, m_b = jax.jit(multi)(jax.tree_util.tree_map(jnp.copy, state),
                              batch[None], key)
    assert int(s_a.step) == int(s_b.step) == 1
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)


def test_multi_substep_prefetch_on_mesh(setup):
    """VERDICT #8: multi-substep + mesh + prefetch compose — the prefetcher
    stacks substep batches on its own thread and lands them with the
    per-step batch axis sharded; the fused multi-step trainer consumes them
    without any host-side jnp.stack in the loop."""
    from anoddpm_tpu.data.pipeline import batch_iterator, prefetch_to_device
    from anoddpm_tpu.data.synthetic import SyntheticMRIDataset
    from anoddpm_tpu.parallel.mesh import make_mesh
    from anoddpm_tpu.training import jit_multi_step

    model, sched, tx, state = setup
    state = jax.tree_util.tree_map(jnp.copy, state)
    mesh = make_mesh()
    substeps = 3
    step = jit_multi_step(make_train_step(model, sched, tx,
                                          make_noise_sampler("gauss"),
                                          max_t=T), substeps, mesh=mesh)
    ds = SyntheticMRIDataset(img_size=(IMG, IMG), length=32)
    loader = prefetch_to_device(batch_iterator(ds, 8, shuffle=False),
                                mesh=mesh, substeps=substeps)
    batch = next(loader)
    x = batch["image"]
    assert x.shape == (substeps, 8, IMG, IMG, 1)
    # leading substep axis replicated, per-step batch axis sharded over data
    assert x.sharding.spec[0] is None and x.sharding.spec[1] == "data"
    # auxiliary keys stay ALIGNED with the stacked images: array values gain
    # the same substep axis, non-array values keep one entry per substep
    for k, v in batch.items():
        if k == "image":
            continue
        if isinstance(v, np.ndarray):
            assert v.shape[0] == substeps
        else:
            assert len(v) == substeps
    state2, metrics = step(state, x, jax.random.key(5))
    assert int(state2.step) == substeps
    assert np.isfinite(float(metrics["loss"]))
