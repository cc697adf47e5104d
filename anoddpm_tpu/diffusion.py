"""The diffusion process engine: q/p distributions, losses, VLB, and the
partial forward-backward primitive — as pure jittable functions.

Re-designs the reference's `GaussianDiffusionModel` (GaussianDiffusion.py:150-478)
TPU-first:

- no object state: every function takes the `Schedule` pytree plus a
  `model_fn(x, t) -> eps` closure (params are closed over by the caller, so
  the same functions serve train/eval/EMA models);
- the reverse chain (GaussianDiffusion.py:351-357, a Python loop of
  per-step host round-trips) is a single `jax.lax.scan`, with the PRNG key
  threaded through the carry and per-step noise (Gaussian or on-device
  simplex) generated inside the scan;
- tensors are NHWC (TPU-native layout); timesteps are an int32 (B,) vector.

All formulas match the reference exactly: epsilon-prediction, x0-clamp to
[-1, 1], fixed reverse variance append(posterior_var[1], betas[1:]), and the
discretised-Gaussian decoder NLL.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .schedule import Schedule
from .ops.noise import NoiseSampler, gaussian_noise

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]


def extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather a[t] and reshape for broadcasting against an ndim tensor
    (reference: GaussianDiffusion.py:32-36, here a device-side gather)."""
    return a[t].reshape(t.shape + (1,) * (ndim - 1))


def mean_flat(x: jax.Array) -> jax.Array:
    """Mean over all non-batch axes (GaussianDiffusion.py:39-40)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


# --------------------------------------------------------------------------
# Forward process q
# --------------------------------------------------------------------------

def sample_q(sched: Schedule, x_0: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """q(x_t | x_0) one-jump sample (GaussianDiffusion.py:361-371)."""
    return (extract(sched.sqrt_alphas_cumprod, t, x_0.ndim) * x_0
            + extract(sched.sqrt_one_minus_alphas_cumprod, t, x_0.ndim) * noise)


def sample_q_gradual(sched: Schedule, x_t: jax.Array, t: jax.Array,
                     noise: jax.Array) -> jax.Array:
    """q(x_t | x_{t-1}) single-step sample (GaussianDiffusion.py:373-382)."""
    return (extract(sched.sqrt_alphas, t, x_t.ndim) * x_t
            + extract(sched.sqrt_betas, t, x_t.ndim) * noise)


def q_mean_variance(sched: Schedule, x_0: jax.Array, t: jax.Array):
    """Mean/variance/log-variance of q(x_t | x_0) (GaussianDiffusion.py:237-251)."""
    mean = extract(sched.sqrt_alphas_cumprod, t, x_0.ndim) * x_0
    variance = extract(1.0 - sched.alphas_cumprod, t, x_0.ndim)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, x_0.ndim)
    return mean, variance, log_variance


def q_posterior_mean_variance(sched: Schedule, x_0: jax.Array, x_t: jax.Array,
                              t: jax.Array):
    """Posterior q(x_{t-1} | x_t, x_0) (GaussianDiffusion.py:253-267)."""
    posterior_mean = (extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_0
                      + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t)
    posterior_var = extract(sched.posterior_variance, t, x_t.ndim)
    posterior_log_var = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return posterior_mean, posterior_var, posterior_log_var


# --------------------------------------------------------------------------
# Reverse process p
# --------------------------------------------------------------------------

def predict_x0_from_eps(sched: Schedule, x_t: jax.Array, t: jax.Array,
                        eps: jax.Array) -> jax.Array:
    return (extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps)


def predict_eps_from_x0(sched: Schedule, x_t: jax.Array, t: jax.Array,
                        pred_x_0: jax.Array) -> jax.Array:
    return ((extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_x_0)
            / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))


class PMeanVariance(NamedTuple):
    mean: jax.Array
    variance: jax.Array
    log_variance: jax.Array
    pred_x_0: jax.Array


def p_mean_variance(model_fn: ModelFn, sched: Schedule, x_t: jax.Array,
                    t: jax.Array,
                    estimate_noise: Optional[jax.Array] = None) -> PMeanVariance:
    """Mean/variance of p(x_{t-1} | x_t) with the fixed model variance
    append(posterior_var[1], betas[1:]) and clamped x0
    (GaussianDiffusion.py:269-296)."""
    if estimate_noise is None:
        estimate_noise = model_fn(x_t, t)
    model_var = extract(sched.model_variance, t, x_t.ndim)
    model_logvar = extract(sched.model_log_variance, t, x_t.ndim)
    pred_x_0 = jnp.clip(predict_x0_from_eps(sched, x_t, t, estimate_noise), -1.0, 1.0)
    model_mean, _, _ = q_posterior_mean_variance(sched, pred_x_0, x_t, t)
    return PMeanVariance(model_mean, model_var, model_logvar, pred_x_0)


def sample_p(model_fn: ModelFn, sched: Schedule, x_t: jax.Array, t: jax.Array,
             key: jax.Array, noise_sampler: NoiseSampler = gaussian_noise):
    """One reverse step x_t -> x_{t-1} (GaussianDiffusion.py:298-318).

    Returns (sample, pred_x_0).  Noise is zeroed where t == 0.
    """
    out = p_mean_variance(model_fn, sched, x_t, t)
    noise = noise_sampler(key, x_t.shape, t)
    nonzero = (t != 0).astype(x_t.dtype).reshape(t.shape + (1,) * (x_t.ndim - 1))
    sample = out.mean + nonzero * jnp.exp(0.5 * out.log_variance) * noise
    return sample, out.pred_x_0


def denoise_chain(model_fn: ModelFn, sched: Schedule, x: jax.Array,
                  t_distance: int, key: jax.Array,
                  noise_sampler: NoiseSampler = gaussian_noise,
                  capture: bool = False):
    """Reverse chain t = t_distance-1 .. 0 as one lax.scan
    (replaces the Python loop at GaussianDiffusion.py:351-357).

    Returns (x_0_hat, frames) where frames is (t_distance, B, H, W, C) when
    capture else None.
    """
    def step(carry, t):
        x, k = carry
        k, sub = jax.random.split(k)
        t_batch = jnp.full((x.shape[0],), t, jnp.int32)
        x_next, _ = sample_p(model_fn, sched, x, t_batch, sub, noise_sampler)
        return (x_next, k), (x_next if capture else None)

    ts = jnp.arange(t_distance - 1, -1, -1)
    (x_final, _), frames = jax.lax.scan(step, (x, key), ts)
    return x_final, frames


def diffuse_gradual_chain(sched: Schedule, x: jax.Array, t_distance: int,
                          key: jax.Array,
                          noise_sampler: NoiseSampler = gaussian_noise):
    """Forward chain of single q-steps t = 0 .. t_distance-1 with per-step
    noise ("whole" mode, GaussianDiffusion.py:331-340).  Returns
    (x_t_distance, frames)."""
    def step(carry, t):
        x, k = carry
        k, sub = jax.random.split(k)
        t_batch = jnp.full((x.shape[0],), t, jnp.int32)
        noise = noise_sampler(sub, x.shape, t_batch)
        x_next = sample_q_gradual(sched, x, t_batch, noise)
        return (x_next, k), x_next

    ts = jnp.arange(0, t_distance)
    (x_final, _), frames = jax.lax.scan(step, (x, key), ts)
    return x_final, frames


def forward_backward(model_fn: ModelFn, sched: Schedule, x: jax.Array,
                     t_distance: Optional[int], key: jax.Array,
                     noise_sampler: NoiseSampler = gaussian_noise,
                     denoise_sampler: Optional[NoiseSampler] = None,
                     see_whole_sequence: Optional[str] = None,
                     gradual_forward: bool = False):
    """THE anomaly-detection primitive: partial diffusion
    (GaussianDiffusion.py:320-359).

    Noise x_0 forward to timestep `t_distance` (one q-jump by default, or a
    per-step gradual chain when `gradual_forward`/"whole"), then denoise back
    with the model.  `noise_sampler` corrupts forward; `denoise_sampler`
    (defaults to the same) supplies the reverse-step noise — the reference's
    `denoise_fn` argument.

    see_whole_sequence: None -> returns (x_recon, None)
                        "half" -> frames = [x_lambda, reverse chain...]
                        "whole" -> frames = [forward chain..., reverse chain...]
    """
    if t_distance == 0:
        return x, None
    if t_distance is None:
        t_distance = sched.num_timesteps
    if denoise_sampler is None:
        denoise_sampler = noise_sampler
    capture = see_whole_sequence is not None
    key_fwd, key_rev = jax.random.split(key)

    if see_whole_sequence == "whole" or gradual_forward:
        x_t, fwd_frames = diffuse_gradual_chain(sched, x, t_distance, key_fwd,
                                                noise_sampler)
    else:
        t_batch = jnp.full((x.shape[0],), t_distance - 1, jnp.int32)
        noise = noise_sampler(key_fwd, x.shape, t_batch)
        x_t = sample_q(sched, x, t_batch, noise)
        fwd_frames = x_t[None] if capture else None

    x_recon, rev_frames = denoise_chain(model_fn, sched, x_t, t_distance,
                                        key_rev, denoise_sampler,
                                        capture=capture)
    if not capture:
        return x_recon, None
    frames = jnp.concatenate([fwd_frames, rev_frames], axis=0)
    return x_recon, frames


def forward_backward_batched_lambda(model_fn: ModelFn, sched: Schedule,
                                    x: jax.Array, lam: jax.Array,
                                    max_t: int, key: jax.Array,
                                    noise_sampler: NoiseSampler = gaussian_noise,
                                    denoise_sampler: Optional[NoiseSampler] = None):
    """Partial diffusion with a PER-SAMPLE traced corruption depth.

    TPU-native replacement for the reference's dense-lambda sweep loop
    (detection.py:349-355 runs forward_backward once per t in [0, 999],
    one compile + one serial chain each): here `lam` is a (B,) int32
    vector of per-sample lambdas, each sample is q-jumped to its own
    lam-1, and ONE masked reverse scan of `max_t` (static) steps denoises
    all of them together — samples are only updated at steps t < lam[i].
    One compiled program serves every lambda value in [0, max_t]; the
    whole lambda grid rides the batch axis of the MXU.

    Key discipline matches `forward_backward` exactly (split into
    fwd/rev, then one split per reverse step), so when every lam[i] ==
    max_t the output is BIT-IDENTICAL to forward_backward(t_distance=
    max_t) with the same key.  lam[i] == 0 returns sample i unchanged.
    """
    if denoise_sampler is None:
        denoise_sampler = noise_sampler
    lam = jnp.asarray(lam, jnp.int32)
    b = x.shape[0]
    key_fwd, key_rev = jax.random.split(key)

    t_corrupt = jnp.clip(lam - 1, 0, None)
    noise = noise_sampler(key_fwd, x.shape, t_corrupt)
    x_corrupt = sample_q(sched, x, t_corrupt, noise)
    active0 = (lam > 0).reshape((b,) + (1,) * (x.ndim - 1))
    x_t = jnp.where(active0, x_corrupt, x)

    def step(carry, t):
        xc, k = carry
        k, sub = jax.random.split(k)
        t_batch = jnp.full((b,), t, jnp.int32)
        x_next, _ = sample_p(model_fn, sched, xc, t_batch, sub,
                             denoise_sampler)
        active = (t < lam).reshape((b,) + (1,) * (x.ndim - 1))
        return (jnp.where(active, x_next, xc), k), None

    ts = jnp.arange(max_t - 1, -1, -1)
    (x_final, _), _ = jax.lax.scan(step, (x_t, key_rev), ts)
    return x_final


# --------------------------------------------------------------------------
# DDIM accelerated sampling (Song et al., "Denoising Diffusion Implicit
# Models", arXiv:2010.02502 — PAPERS.md).  Framework addition beyond the
# reference: the lambda-step reverse chain is replaced by S << lambda
# deterministic (eta=0) strided steps, trading model evaluations for
# throughput at matched anomaly-map quality.
# --------------------------------------------------------------------------

def ddim_step(sched: Schedule, x_t: jax.Array, t: jax.Array,
              t_prev: jax.Array, eps: jax.Array, eta: float = 0.0,
              noise: Optional[jax.Array] = None):
    """One DDIM update x_t -> x_{t_prev} given the model's eps estimate.

    t_prev == -1 denotes the terminal step to x_0 (alpha_bar_prev = 1).
    """
    ndim = x_t.ndim
    acp_t = extract(sched.alphas_cumprod, t, ndim)
    acp_prev = jnp.where(
        (t_prev < 0).reshape(t_prev.shape + (1,) * (ndim - 1)),
        1.0, extract(sched.alphas_cumprod, jnp.maximum(t_prev, 0), ndim))
    pred_x0 = jnp.clip(
        (x_t - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t), -1.0, 1.0)
    # re-derive eps from the clamped x0 so the update stays consistent
    eps_hat = (x_t - jnp.sqrt(acp_t) * pred_x0) / jnp.sqrt(1.0 - acp_t)
    sigma = (eta * jnp.sqrt((1.0 - acp_prev) / (1.0 - acp_t))
             * jnp.sqrt(1.0 - acp_t / acp_prev))
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma ** 2, 0.0)) * eps_hat
    x_prev = jnp.sqrt(acp_prev) * pred_x0 + dir_xt
    if noise is not None:
        x_prev = x_prev + sigma * noise
    return x_prev, pred_x0


def ddim_timesteps(t_distance: int, num_steps: int) -> jnp.ndarray:
    """Descending strided subsequence of [0, t_distance): S evenly spaced
    timesteps ending at 0."""
    num_steps = min(num_steps, t_distance)
    ts = jnp.linspace(0, t_distance - 1, num_steps).round().astype(jnp.int32)
    return ts[::-1]


def ddim_chain(model_fn: ModelFn, sched: Schedule, x: jax.Array,
               t_distance: int, num_steps: int, key: jax.Array,
               eta: float = 0.0,
               noise_sampler: NoiseSampler = gaussian_noise,
               capture: bool = False):
    """Strided reverse chain x_{t_distance-1} -> x_0 in `num_steps` model
    evaluations, as one lax.scan."""
    ts = ddim_timesteps(t_distance, num_steps)
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])

    def step(carry, t_pair):
        xc, k = carry
        t, t_prev = t_pair
        k, sub = jax.random.split(k)
        t_batch = jnp.full((xc.shape[0],), t, jnp.int32)
        tp_batch = jnp.full((xc.shape[0],), t_prev, jnp.int32)
        eps = model_fn(xc, t_batch)
        noise = noise_sampler(sub, xc.shape, t_batch) if eta > 0 else None
        x_next, _ = ddim_step(sched, xc, t_batch, tp_batch, eps, eta, noise)
        return (x_next, k), (x_next if capture else None)

    (x_final, _), frames = jax.lax.scan(step, (x, key),
                                        jnp.stack([ts, ts_prev], axis=1))
    return x_final, frames


def forward_backward_ddim(model_fn: ModelFn, sched: Schedule, x: jax.Array,
                          t_distance: int, num_steps: int, key: jax.Array,
                          noise_sampler: NoiseSampler = gaussian_noise,
                          eta: float = 0.0,
                          see_whole_sequence: Optional[str] = None):
    """Partial diffusion with a DDIM-strided reverse chain: one q-jump to
    t_distance, then `num_steps` deterministic reverse steps.  Same contract
    as `forward_backward`."""
    if t_distance == 0:
        return x, None
    capture = see_whole_sequence is not None
    key_fwd, key_rev = jax.random.split(key)
    t_batch = jnp.full((x.shape[0],), t_distance - 1, jnp.int32)
    noise = noise_sampler(key_fwd, x.shape, t_batch)
    x_t = sample_q(sched, x, t_batch, noise)
    x_recon, rev_frames = ddim_chain(model_fn, sched, x_t, t_distance,
                                     num_steps, key_rev, eta, noise_sampler,
                                     capture=capture)
    if not capture:
        return x_recon, None
    return x_recon, jnp.concatenate([x_t[None], rev_frames], axis=0)


# --------------------------------------------------------------------------
# Likelihoods / losses
# --------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)) in nats
    (GaussianDiffusion.py:43-53)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + (mean1 - mean2) ** 2 * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    """tanh-based CDF approximation (GaussianDiffusion.py:56-61)."""
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                 * (x + 0.044715 * x ** 3)))


def discretised_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of a Gaussian discretised to the +-1/255 image bins
    (GaussianDiffusion.py:64-93).  x in [-1, 1]."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, 1e-12))))


def calc_vlb_xt(model_fn: ModelFn, sched: Schedule, x_0, x_t, t,
                estimate_noise=None):
    """Per-timestep VLB term in bits: KL(q||p) at t>0, discretised decoder
    NLL at t=0 (GaussianDiffusion.py:384-397)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_0, x_t, t)
    out = p_mean_variance(model_fn, sched, x_t, t, estimate_noise)
    kl = mean_flat(normal_kl(true_mean, true_log_var, out.mean,
                             out.log_variance)) / math.log(2.0)
    decoder_nll = -discretised_gaussian_log_likelihood(
        x_0, out.mean, log_scales=0.5 * out.log_variance)
    decoder_nll = mean_flat(decoder_nll) / math.log(2.0)
    nll = jnp.where(t == 0, decoder_nll, kl)
    return nll, out.pred_x_0


def prior_vlb(sched: Schedule, x_0: jax.Array) -> jax.Array:
    """KL(q(x_T | x_0) || N(0, I)) in bits (GaussianDiffusion.py:436-443)."""
    b = x_0.shape[0]
    t = jnp.full((b,), sched.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_log_variance = q_mean_variance(sched, x_0, t)
    kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
    return mean_flat(kl_prior) / math.log(2.0)


def calc_loss(model_fn: ModelFn, sched: Schedule, x_0: jax.Array,
              t: jax.Array, key: jax.Array,
              noise_sampler: NoiseSampler = gaussian_noise,
              loss_type: str = "l2"):
    """Simple / hybrid training objective (GaussianDiffusion.py:399-417).

    Returns (per-sample loss, aux dict with x_t and the model estimate).
    """
    noise = noise_sampler(key, x_0.shape, t)
    x_t = sample_q(sched, x_0, t, noise)
    estimate = model_fn(x_t, t)
    if loss_type == "l1":
        loss = mean_flat(jnp.abs(estimate - noise))
    elif loss_type == "hybrid":
        vlb, _ = calc_vlb_xt(model_fn, sched, x_0, x_t, t, estimate)
        loss = vlb + mean_flat((estimate - noise) ** 2)
    else:  # "l2" and the reference's fall-through default
        loss = mean_flat((estimate - noise) ** 2)
    return loss, {"x_t": x_t, "estimate": estimate, "noise": noise}


def sample_timesteps(key: jax.Array, batch: int, max_t: int) -> jax.Array:
    """Uniform t ~ U[0, max_t) — with train_start, max_t = min(sample_distance,
    T) so the model never trains on t >= lambda_max (GaussianDiffusion.py:419-427;
    intentional, must be preserved)."""
    return jax.random.randint(key, (batch,), 0, max_t)


def make_loss_weights(loss_weight: str, num_timesteps: int):
    """Importance-sampling weight table for t (GaussianDiffusion.py:178-182)."""
    if loss_weight == "prop-t":
        return jnp.arange(num_timesteps, 0, -1).astype(jnp.float32)
    if loss_weight == "uniform":
        return jnp.ones((num_timesteps,), jnp.float32)
    return None


def sample_t_with_weights(key: jax.Array, batch: int, weight_table: jax.Array):
    """Weighted timestep draw + importance weights
    (GaussianDiffusion.py:220-226).

    INTENTIONAL DEVIATION: this computes the textbook importance weight
    1/(N*p[t]); the reference computes (1/N)*p[t] — a bug that scales the
    loss by ~p^2*N^2 relative to the unbiased estimator.  No shipped config
    uses loss_weight != 'none', so shipped-config behaviour is identical;
    documented in PARITY.md's quirk table.
    """
    p = weight_table / jnp.sum(weight_table)
    t = jax.random.choice(key, weight_table.shape[0], (batch,), p=p)
    weights = 1.0 / (weight_table.shape[0] * p[t])
    return t, weights


def calc_total_vlb(model_fn: ModelFn, sched: Schedule, x_0: jax.Array,
                   key: jax.Array):
    """Full T-step VLB sweep (GaussianDiffusion.py:445-478) as a lax.scan.

    Returns dict with total_vlb/prior_vlb (B,), and vb/x_0_mse/mse of shape
    (B, T) ordered by DESCENDING t (index i <-> t = T-1-i), matching the
    reference's stacking order.
    """
    num_t = sched.num_timesteps

    def step(k, t):
        k, sub = jax.random.split(k)
        t_batch = jnp.full((x_0.shape[0],), t, jnp.int32)
        noise = jax.random.normal(sub, x_0.shape, x_0.dtype)
        x_t = sample_q(sched, x_0, t_batch, noise)
        vb, pred_x_0 = calc_vlb_xt(model_fn, sched, x_0, x_t, t_batch)
        x0_mse = mean_flat((pred_x_0 - x_0) ** 2)
        eps = predict_eps_from_x0(sched, x_t, t_batch, pred_x_0)
        mse = mean_flat((eps - noise) ** 2)
        return k, (vb, x0_mse, mse)

    ts = jnp.arange(num_t - 1, -1, -1)
    _, (vb, x0_mse, mse) = jax.lax.scan(step, key, ts)
    vb = vb.T          # (B, T), descending t
    x0_mse = x0_mse.T
    mse = mse.T
    p_vlb = prior_vlb(sched, x_0)
    return {
        "total_vlb": jnp.sum(vb, axis=1) + p_vlb,
        "prior_vlb": p_vlb,
        "vb": vb,
        "x_0_mse": x0_mse,
        "mse": mse,
    }
