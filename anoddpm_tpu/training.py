"""Training state and the fused, shardable train step.

Replaces the reference's per-step host-driven loop (diffusion_training.py:
91-108: p_loss -> backward -> clip -> AdamW step -> EMA walk) with ONE jitted
function: timestep sampling, on-device noise generation, forward+backward
through the UNet, global-norm clipping, AdamW update and the EMA tree-map all
compile into a single XLA program.  Under a data mesh the batch arrives
sharded and XLA inserts the gradient all-reduce over ICI (parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from . import diffusion as dm
from .models.ema import ema_update
from .ops.noise import NoiseSampler
from .schedule import Schedule


@flax.struct.dataclass
class TrainState:
    step: jax.Array          # int32 scalar
    params: Any
    ema_params: Any
    opt_state: Any


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   grad_clip_norm: float = 1.0) -> optax.GradientTransformation:
    """AdamW(lr, betas=(0.9, 0.999), wd) + global-norm clip 1.0
    (diffusion_training.py:75, :104)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay),
    )


def init_train_state(model, tx: optax.GradientTransformation, key: jax.Array,
                     sample_shape: Tuple[int, ...]) -> TrainState:
    x = jnp.zeros(sample_shape, jnp.float32)
    t = jnp.zeros((sample_shape[0],), jnp.int32)
    params = model.init(key, x, t)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree_util.tree_map(lambda p: p, params),
        opt_state=tx.init(params),
    )


def make_train_step(model, sched: Schedule, tx: optax.GradientTransformation,
                    noise_sampler: NoiseSampler, loss_type: str = "l2",
                    max_t: Optional[int] = None, ema_decay: float = 0.9999,
                    loss_weight: str = "none",
                    dropout: bool = False,
                    remat: Optional[str] = None) -> Callable:
    """Build the fused train step.

    max_t: upper bound for uniform timestep sampling — min(sample_distance, T)
    when train_start is set (GaussianDiffusion.py:419-427).
    remat: rematerialisation policy for the UNet forward under grad —
    None (store all activations), "dots" (save matmul/conv outputs,
    recompute elementwise chains — trades FLOPs for HBM, unlocking larger
    batches), or "nothing" (recompute everything).
    """
    if max_t is None:
        max_t = sched.num_timesteps
    weight_table = dm.make_loss_weights(loss_weight, sched.num_timesteps)
    remat_policy = {
        None: None,
        "dots": jax.checkpoint_policies.dots_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }[remat]

    def train_step(state: TrainState, batch: jax.Array,
                   key: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        key = jax.random.fold_in(key, state.step)
        t_key, noise_key, drop_key = jax.random.split(key, 3)
        b = batch.shape[0]
        if weight_table is None:
            t = dm.sample_timesteps(t_key, b, max_t)
            weights = jnp.ones((b,), jnp.float32)
        else:
            t, weights = dm.sample_t_with_weights(t_key, b, weight_table)

        def loss_fn(params):
            def model_fn(x, tt):
                kwargs = {}
                if dropout:
                    kwargs = {"rngs": {"dropout": drop_key},
                              "deterministic": False}
                return model.apply(params, x, tt, **kwargs)
            if remat_policy is not None:
                model_fn = jax.checkpoint(model_fn, policy=remat_policy)
            per_sample, aux = dm.calc_loss(model_fn, sched, batch, t,
                                           noise_key, noise_sampler, loss_type)
            return jnp.mean(per_sample * weights), aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(state.ema_params, new_params, ema_decay)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               ema_params=new_ema, opt_state=new_opt_state)
        del aux  # x_t/estimate stay on-device; snapshots recompute on demand
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_multi_step(train_step: Callable, substeps: int,
                    unroll: int = 1) -> Callable:
    """Fuse `substeps` optimizer steps into one dispatch via lax.scan.

    The batch must carry a leading substep axis: (substeps, B, H, W, C).
    Amortises host->device dispatch overhead (significant for small models
    and high-latency runtimes); metrics are averaged over the substeps.
    unroll: lax.scan unroll factor — unrolled bodies give XLA cross-step
    scheduling freedom at the cost of program size (MFU probe lever).
    """
    def multi_step(state: TrainState, batches: jax.Array, key: jax.Array):
        def body(carry, batch):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = train_step(st, batch, sub)
            return (st, k), (m["loss"], m["grad_norm"])

        (state_out, _), (losses, gnorms) = jax.lax.scan(
            body, (state, key), batches, unroll=unroll)
        metrics = {"loss": jnp.mean(losses), "grad_norm": jnp.mean(gnorms)}
        return state_out, metrics

    return multi_step


def jit_train_step(train_step: Callable, mesh=None, ndim: int = 4) -> Callable:
    """jit the step; with a mesh, shard the batch over 'data' and replicate
    state/key so XLA all-reduces gradients over ICI."""
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    from .parallel.mesh import batch_sharding, replicated
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, batch_sharding(mesh, ndim), rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def jit_multi_step(train_step: Callable, substeps: int, mesh=None,
                   ndim: int = 4) -> Callable:
    """jit the fused multi-substep trainer; with a mesh, shard the PER-STEP
    batch axis (axis 1 of the stacked (substeps, B, ...) input)."""
    ms = make_multi_step(train_step, substeps)
    if mesh is None:
        return jax.jit(ms, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .parallel.mesh import replicated
    rep = replicated(mesh)
    bs = NamedSharding(mesh, P(None, "data", *([None] * (ndim - 1))))
    return jax.jit(ms, in_shardings=(rep, bs, rep),
                   out_shardings=(rep, rep), donate_argnums=(0,))


def make_eval_model_fn(model, params) -> dm.ModelFn:
    """Deterministic eps-predictor closure for sampling/eval.

    NOTE: only for use INSIDE an already-jitted function whose params come in
    as arguments.  jitting a closure over large params embeds them as HLO
    constants (a 131M-param model becomes a ~500MB program — this
    environment's compile service rejects it).  At jit boundaries use
    `EvalModel` + `jit_with_params` instead.
    """
    @functools.wraps(model.apply)
    def model_fn(x, t):
        return model.apply(params, x, t)
    return model_fn


class EvalModel:
    """A (flax module, params) pair for evaluation-time sampling."""

    def __init__(self, module, params):
        self.module = module
        self.params = params

    def __call__(self, x, t):
        return self.module.apply(self.params, x, t)


def jit_with_params(em: EvalModel, fn_of_modelfn: Callable) -> Callable:
    """jit a sampler built from a model_fn, passing params as a RUNTIME
    argument (never baked into the program as constants).

    fn_of_modelfn(model_fn) must return f(*args); the returned callable has
    the same signature as f.
    """
    @jax.jit
    def wrapped(params, *args):
        mf = lambda xx, tt: em.module.apply(params, xx, tt)
        return fn_of_modelfn(mf)(*args)

    return functools.partial(wrapped, em.params)
