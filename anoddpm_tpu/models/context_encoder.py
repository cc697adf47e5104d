"""Context-encoder inpainting baseline for the ROC comparisons.

The reference compares AnoDDPM against a context-encoder GAN
(detection.py:683-920 `gan_anomalous` / `ce_sliding_window`, roc_data
:431-680) — but the model code it imports (Comparative_models/CE.py) is
absent from the reference repository, so those paths cannot run as shipped
(SURVEY.md §2.2).  This module provides a WORKING baseline with the same
role: an encoder-decoder trained to inpaint masked patches of healthy
images; at detection time a sliding occlusion mask is swept over the image
and the per-pixel reconstruction square error forms the anomaly map.

(Reconstruction-objective variant of Pathak et al.'s context encoder — the
adversarial term mainly sharpens textures and is unnecessary for the
anomaly-scoring role.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class ContextEncoder(nn.Module):
    """Conv encoder-decoder: (masked image, mask) -> inpainted image."""
    base_channels: int = 32
    levels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = jnp.concatenate([x * (1.0 - mask), mask], axis=-1).astype(self.dtype)
        skips = []
        ch = self.base_channels
        for i in range(self.levels):
            h = nn.Conv(ch * (2 ** i), (4, 4), strides=(2, 2),
                        padding="SAME", dtype=self.dtype)(h)
            h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(
                h.astype(jnp.float32)).astype(self.dtype))
            skips.append(h)
        h = nn.Conv(ch * (2 ** self.levels), (3, 3), padding="SAME",
                    dtype=self.dtype)(h)
        h = nn.silu(h)
        for i in reversed(range(self.levels)):
            h = jnp.concatenate([h, skips[i]], axis=-1)  # same resolution
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = nn.Conv(ch * (2 ** i), (3, 3), padding="SAME",
                        dtype=self.dtype)(h)
            h = nn.silu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(
                h.astype(jnp.float32)).astype(self.dtype))
        out = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                      dtype=jnp.float32)(h)
        # composite: keep visible pixels, inpaint the masked hole
        return (x * (1.0 - mask) + out.astype(jnp.float32) * mask)


def random_box_mask(key: jax.Array, shape: Tuple[int, ...],
                    frac: float = 0.25) -> jax.Array:
    """(B, H, W, 1) random square occlusion masks covering ~frac of each side."""
    b, h, w, _ = shape
    bh = max(int(h * frac), 1)
    bw = max(int(w * frac), 1)
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (b,), 0, h - bh + 1)
    xs = jax.random.randint(kx, (b,), 0, w - bw + 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    m = ((yy >= ys[:, None, None]) & (yy < (ys + bh)[:, None, None])
         & (xx >= xs[:, None, None]) & (xx < (xs + bw)[:, None, None]))
    return m.astype(jnp.float32)[..., None]


def make_ce_train_step(model: ContextEncoder,
                       tx: optax.GradientTransformation):
    """Masked-region L2 reconstruction step."""
    def step(params, opt_state, batch, key):
        mask = random_box_mask(key, batch.shape)

        def loss_fn(p):
            recon = model.apply(p, batch, mask)
            per_pix = (recon - batch) ** 2 * mask
            return jnp.sum(per_pix) / (jnp.sum(mask) + 1e-6)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def sliding_window_error(model: ContextEncoder, params, images: jax.Array,
                         window: int = 4) -> jax.Array:
    """Anomaly map via a sliding occlusion grid (detection.py:683-920 role):
    occlude each grid cell in turn, inpaint, accumulate the square error of
    each cell's reconstruction.  Returns (B, H, W, C) square-error map."""
    b, h, w, c = images.shape
    step_h, step_w = h // window, w // window

    def cell(idx, acc):
        gy = idx // window
        gx = idx % window
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        m = ((yy >= gy * step_h) & (yy < (gy + 1) * step_h)
             & (xx >= gx * step_w) & (xx < (gx + 1) * step_w))
        mask = jnp.broadcast_to(m.astype(jnp.float32)[None, ..., None],
                                (b, h, w, 1))
        recon = model.apply(params, images, mask)
        return acc + (recon - images) ** 2 * mask

    return jax.lax.fori_loop(0, window * window, cell,
                             jnp.zeros_like(images))


def sliding_window_inpaint(model: ContextEncoder, params,
                           images: jax.Array, window: int = 4) -> jax.Array:
    """Full-image CE reconstruction: each grid cell is occluded in turn and
    replaced by its inpainted content.  Reconstruction counterpart of
    `sliding_window_error` for the baseline figure sheets (the reference
    reconstructs via `ce_sliding_window` before plotting,
    generate_images.py:935-1056)."""
    b, h, w, c = images.shape
    step_h, step_w = h // window, w // window

    def cell(idx, acc):
        gy = idx // window
        gx = idx % window
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        m = ((yy >= gy * step_h) & (yy < (gy + 1) * step_h)
             & (xx >= gx * step_w) & (xx < (gx + 1) * step_w))
        mask = jnp.broadcast_to(m.astype(jnp.float32)[None, ..., None],
                                (b, h, w, 1))
        recon = model.apply(params, images, mask)
        return acc * (1.0 - mask) + recon * mask

    return jax.lax.fori_loop(0, window * window, cell, images)
