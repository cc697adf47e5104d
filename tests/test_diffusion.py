"""Diffusion engine tests: q/p round trips, loss dispatch, VLB terms, and the
fused forward-backward scan (reference semantics: GaussianDiffusion.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu import diffusion as dm
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule


@pytest.fixture(scope="module")
def sched():
    return make_schedule(get_beta_schedule(50, "linear"))


def _zero_model(x, t):
    return jnp.zeros_like(x)


def test_sample_q_statistics(sched):
    key = jax.random.key(0)
    x0 = jnp.ones((4, 8, 8, 1))
    t = jnp.full((4,), 30, jnp.int32)
    noise = jax.random.normal(key, x0.shape)
    x_t = dm.sample_q(sched, x0, t, noise)
    sac = np.asarray(sched.sqrt_alphas_cumprod)[30]
    somac = np.asarray(sched.sqrt_one_minus_alphas_cumprod)[30]
    np.testing.assert_allclose(np.asarray(x_t), sac + somac * np.asarray(noise),
                               rtol=1e-5)


def test_predict_x0_roundtrip(sched):
    key = jax.random.key(1)
    x0 = jax.random.uniform(key, (2, 8, 8, 1), minval=-1, maxval=1)
    eps = jax.random.normal(jax.random.key(2), x0.shape)
    t = jnp.array([10, 40], jnp.int32)
    x_t = dm.sample_q(sched, x0, t, eps)
    x0_hat = dm.predict_x0_from_eps(sched, x_t, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    eps_hat = dm.predict_eps_from_x0(sched, x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), atol=1e-3)


def test_q_posterior_t0_mean_is_x0ish(sched):
    # at t=0, posterior mean coef1 ~ 1 as acp_prev=1
    x0 = jnp.ones((1, 4, 4, 1)) * 0.5
    x_t = jnp.ones((1, 4, 4, 1)) * 0.3
    t = jnp.zeros((1,), jnp.int32)
    mean, var, logvar = dm.q_posterior_mean_variance(sched, x0, x_t, t)
    # posterior variance at t=0 is 0; log is clipped to t=1 value
    assert np.asarray(var)[0, 0, 0, 0] == 0.0
    assert np.isfinite(np.asarray(logvar)).all()


def test_sample_p_t0_is_deterministic(sched):
    x_t = jax.random.normal(jax.random.key(3), (2, 8, 8, 1))
    t = jnp.zeros((2,), jnp.int32)
    s1, _ = dm.sample_p(_zero_model, sched, x_t, t, jax.random.key(4))
    s2, _ = dm.sample_p(_zero_model, sched, x_t, t, jax.random.key(5))
    # no noise is added at t=0 regardless of key
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_normal_kl_zero_for_identical():
    kl = dm.normal_kl(jnp.array(1.5), jnp.array(0.3), jnp.array(1.5), jnp.array(0.3))
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)


def test_discretised_ll_peak():
    # likelihood of x=mean with tiny scale should be ~log(bin mass) ~ 0 order
    ll = dm.discretised_gaussian_log_likelihood(
        jnp.zeros((1,)), jnp.zeros((1,)), jnp.full((1,), -5.0))
    assert np.asarray(ll)[0] > -1.0  # near-certain bin
    ll_far = dm.discretised_gaussian_log_likelihood(
        jnp.full((1,), 0.9), jnp.zeros((1,)), jnp.full((1,), -5.0))
    assert np.asarray(ll_far)[0] < -10


@pytest.mark.parametrize("loss_type", ["l2", "l1", "hybrid"])
def test_calc_loss_dispatch(sched, loss_type):
    x0 = jax.random.uniform(jax.random.key(6), (2, 8, 8, 1), minval=-1, maxval=1)
    t = jnp.array([5, 20], jnp.int32)
    loss, aux = dm.calc_loss(_zero_model, sched, x0, t, jax.random.key(7),
                             loss_type=loss_type)
    assert loss.shape == (2,)
    assert np.isfinite(np.asarray(loss)).all()
    assert aux["x_t"].shape == x0.shape


def test_forward_backward_shapes_and_capture(sched):
    x0 = jax.random.uniform(jax.random.key(8), (1, 8, 8, 1), minval=-1, maxval=1)
    recon, frames = dm.forward_backward(_zero_model, sched, x0, 10,
                                        jax.random.key(9))
    assert recon.shape == x0.shape
    assert frames is None
    recon2, frames2 = dm.forward_backward(_zero_model, sched, x0, 10,
                                          jax.random.key(9),
                                          see_whole_sequence="half")
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2), rtol=1e-5)
    assert frames2.shape == (11, 1, 8, 8, 1)  # x_lambda + 10 reverse frames
    _, frames3 = dm.forward_backward(_zero_model, sched, x0, 10,
                                     jax.random.key(9),
                                     see_whole_sequence="whole")
    assert frames3.shape == (20, 1, 8, 8, 1)  # 10 forward + 10 reverse


def test_forward_backward_t0_identity(sched):
    x0 = jnp.ones((1, 4, 4, 1)) * 0.25
    recon, _ = dm.forward_backward(_zero_model, sched, x0, 0, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(x0))


def test_batched_lambda_matches_forward_backward_at_max(sched):
    """forward_backward_batched_lambda with every lam[i] == max_t must be
    BIT-IDENTICAL to forward_backward(t_distance=max_t) under the same key
    (identical key-split discipline by construction)."""
    x0 = jax.random.uniform(jax.random.key(20), (3, 8, 8, 1),
                            minval=-1, maxval=1)
    key = jax.random.key(21)
    ref, _ = dm.forward_backward(_zero_model, sched, x0, 10, key)
    got = dm.forward_backward_batched_lambda(
        _zero_model, sched, x0, jnp.full((3,), 10, jnp.int32), 10, key)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_batched_lambda_zero_is_identity_and_masks_per_sample(sched):
    """lam[i]=0 samples pass through untouched even while neighbours in the
    same dispatch are corrupted+denoised; deeper lambda corrupts more."""
    x0 = jnp.broadcast_to(jnp.linspace(-1, 1, 8 * 8).reshape(1, 8, 8, 1),
                          (3, 8, 8, 1))
    lam = jnp.array([0, 5, 40], jnp.int32)
    out = dm.forward_backward_batched_lambda(
        _zero_model, sched, x0, lam, 40, jax.random.key(22))
    out = np.asarray(out)
    np.testing.assert_array_equal(out[0], np.asarray(x0[0]))
    assert np.isfinite(out).all()
    # same input slice, deeper corruption -> larger deviation from x_0
    d1 = np.abs(out[1] - np.asarray(x0[1])).mean()
    d2 = np.abs(out[2] - np.asarray(x0[2])).mean()
    assert 0 < d1 < d2


def test_calc_total_vlb_shapes(sched):
    x0 = jax.random.uniform(jax.random.key(10), (2, 8, 8, 1), minval=-1, maxval=1)
    out = dm.calc_total_vlb(_zero_model, sched, x0, jax.random.key(11))
    assert out["total_vlb"].shape == (2,)
    assert out["vb"].shape == (2, 50)
    assert np.isfinite(np.asarray(out["total_vlb"])).all()
    # total = sum(vb) + prior
    np.testing.assert_allclose(
        np.asarray(out["total_vlb"]),
        np.asarray(out["vb"]).sum(1) + np.asarray(out["prior_vlb"]), rtol=1e-4)


def test_timestep_sampling_bounds():
    t = dm.sample_timesteps(jax.random.key(12), 512, 37)
    arr = np.asarray(t)
    assert arr.min() >= 0 and arr.max() < 37


def test_weighted_timestep_sampling():
    table = dm.make_loss_weights("prop-t", 100)
    t, w = dm.sample_t_with_weights(jax.random.key(13), 1000, table)
    arr = np.asarray(t)
    assert arr.min() >= 0 and arr.max() < 100
    # prop-t favours small t
    assert (arr < 50).mean() > 0.55
    assert np.isfinite(np.asarray(w)).all()
    assert dm.make_loss_weights("none", 100) is None
