"""Exponential moving average of parameters as a pytree map.

Replaces the reference's in-place named_parameters walk (UNet.py:423-427)
with a pure `tree_map` — jit-friendly and shardable: under pjit the EMA
update compiles into the training step with no host sync.
"""

from __future__ import annotations

import jax


def init_ema(params):
    """EMA starts as a copy of the model params (diffusion_training.py:70)."""
    return jax.tree_util.tree_map(lambda p: p, params)


def ema_update(ema_params, params, decay: float = 0.9999):
    """ema <- decay * ema + (1 - decay) * params (UNet.py:423-427)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)
