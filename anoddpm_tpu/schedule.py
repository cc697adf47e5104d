"""Diffusion noise schedules as an immutable jnp pytree.

The reference keeps its schedule buffers as loose NumPy arrays on the model
object and gathers them per-step on the host (reference:
GaussianDiffusion.py:150-217, extract at :32-36).  Here the whole schedule is
a single frozen flax.struct dataclass of device arrays: it is a pytree, so it
threads through jit/pjit/scan as a constant-shaped argument and every gather
happens on device.

All buffers are computed in float64 on host for accuracy (the beta schedules
themselves are tiny), then stored as float32 device arrays.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


def get_beta_schedule(num_diffusion_steps: int, name: str = "cosine") -> np.ndarray:
    """Beta schedule (reference: GaussianDiffusion.py:12-29).

    - "cosine": Nichol & Dhariwal improved-DDPM cosine schedule, betas capped
      at 0.999.
    - "linear": linear 1e-4 -> 0.02 at T=1000, scaled by 1000/T otherwise.
    """
    if name == "cosine":
        max_beta = 0.999
        f = lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        steps = np.arange(num_diffusion_steps, dtype=np.float64)
        t1 = steps / num_diffusion_steps
        t2 = (steps + 1) / num_diffusion_steps
        betas = np.minimum(1.0 - f(t2) / f(t1), max_beta)
        return betas
    elif name == "linear":
        scale = 1000 / num_diffusion_steps
        beta_start = scale * 0.0001
        beta_end = scale * 0.02
        return np.linspace(beta_start, beta_end, num_diffusion_steps, dtype=np.float64)
    raise NotImplementedError(f"unknown beta schedule: {name}")


@flax.struct.dataclass
class Schedule:
    """Precomputed diffusion quantities, all shape (T,) float32 device arrays.

    Field-for-field the same quantities the reference precomputes
    (GaussianDiffusion.py:184-217), plus the fixed reverse-process variance
    (GaussianDiffusion.py:282-283) so nothing is rebuilt per step.
    """

    betas: jnp.ndarray
    sqrt_alphas: jnp.ndarray
    sqrt_betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # Fixed reverse-process ("model") variance: append(posterior_var[1], betas[1:]).
    model_variance: jnp.ndarray
    model_log_variance: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(betas: np.ndarray) -> Schedule:
    betas = np.asarray(betas, dtype=np.float64)
    if (betas >= 1.0).any():
        import warnings
        warnings.warn(
            "beta schedule contains values >= 1 (linear schedule at small T "
            "scales by 1000/T — reference formula); downstream sqrt terms "
            "will be NaN. Use the cosine schedule for T < 50.",
            RuntimeWarning)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    # All sqrt/log/recip buffers are computed through clipped intermediates so
    # degenerate schedules (betas >= 1 at small linear T — warned above — or
    # T=1 where the posterior variance is identically 0) yield finite buffers
    # instead of NaN/-inf RuntimeWarnings.  For well-formed schedules the
    # clips are no-ops.
    tiny = np.finfo(np.float64).tiny
    alphas_pos = np.clip(alphas, 0.0, None)
    # Floor chosen so sqrt(1/acp) stays finite after the float32 cast.
    acp_pos = np.clip(alphas_cumprod, 1e-20, None)
    one_minus_acp = np.clip(1.0 - alphas_cumprod, tiny, None)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / one_minus_acp
    # Clipped because the posterior variance is 0 at t=0 (at T=1 there is no
    # t=1 entry to borrow, so the t=0 value is used).
    pv1 = posterior_variance[min(1, len(betas) - 1)]
    posterior_log_variance_clipped = np.log(
        np.clip(np.append(pv1, posterior_variance[1:]), tiny, None)
    )
    model_variance = np.append(pv1, betas[1:])

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return Schedule(
        betas=f32(betas),
        sqrt_alphas=f32(np.sqrt(alphas_pos)),
        sqrt_betas=f32(np.sqrt(np.clip(betas, 0.0, None))),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(acp_pos)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(one_minus_acp)),
        log_one_minus_alphas_cumprod=f32(np.log(one_minus_acp)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp_pos)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(np.clip(1.0 / acp_pos - 1.0, 0.0, None))),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(betas * np.sqrt(np.clip(alphas_cumprod_prev, 0.0, None)) / one_minus_acp),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas_pos) / one_minus_acp
        ),
        model_variance=f32(model_variance),
        model_log_variance=f32(np.log(np.clip(model_variance, tiny, None))),
    )


def schedule_from_args(args) -> Schedule:
    return make_schedule(get_beta_schedule(int(args["T"]), args["beta_schedule"]))
