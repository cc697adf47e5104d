"""Context-encoder baseline (the working replacement for the reference's
absent Comparative_models/CE.py — PARITY.md C17)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from anoddpm_tpu.data.synthetic import (SyntheticAnomalyDataset,
                                        SyntheticMRIDataset)
from anoddpm_tpu.models.context_encoder import (ContextEncoder,
                                                make_ce_train_step,
                                                random_box_mask,
                                                sliding_window_error)

IMG = 32


def test_random_box_mask():
    m = random_box_mask(jax.random.key(0), (4, IMG, IMG, 1), frac=0.25)
    arr = np.asarray(m)
    assert arr.shape == (4, IMG, IMG, 1)
    assert set(np.unique(arr)) <= {0.0, 1.0}
    # each mask covers exactly an 8x8 box
    assert np.allclose(arr.sum(axis=(1, 2, 3)), 64)


def test_ce_training_reduces_masked_loss():
    model = ContextEncoder(base_channels=16, levels=2)
    ds = SyntheticMRIDataset(img_size=(IMG, IMG), length=8)
    batch = jnp.asarray(np.stack([ds[i]["image"] for i in range(8)]))
    params = jax.jit(model.init)(jax.random.key(0), batch,
                                 jnp.zeros((8, IMG, IMG, 1)))
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    step = make_ce_train_step(model, tx)
    losses = []
    key = jax.random.key(1)
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])  # it learns


def test_sliding_window_error_map():
    model = ContextEncoder(base_channels=16, levels=2)
    ano = SyntheticAnomalyDataset(img_size=(IMG, IMG), length=1)
    images = jnp.asarray(ano[0]["image"])
    params = jax.jit(model.init)(jax.random.key(0), images,
                                 jnp.zeros(images.shape[:3] + (1,)))
    err = sliding_window_error(model, params, images, window=4)
    arr = np.asarray(err)
    assert arr.shape == images.shape
    assert np.isfinite(arr).all()
    assert arr.min() >= 0
    assert arr.max() > 0  # untrained net reconstructs imperfectly everywhere
