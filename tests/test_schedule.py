"""Schedule math vs closed forms (reference: GaussianDiffusion.py:12-29,
:184-217)."""
import numpy as np

from anoddpm_tpu.schedule import Schedule, get_beta_schedule, make_schedule


def test_linear_schedule_values():
    betas = get_beta_schedule(1000, "linear")
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4)
    np.testing.assert_allclose(betas[-1], 0.02)
    # T-scaling: at T=100 the linear schedule is scaled by 1000/T
    betas100 = get_beta_schedule(100, "linear")
    np.testing.assert_allclose(betas100[0], 1e-3)
    np.testing.assert_allclose(betas100[-1], 0.2)


def test_cosine_schedule_values():
    betas = get_beta_schedule(1000, "cosine")
    assert (betas > 0).all() and (betas <= 0.999).all()
    f = lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    expected0 = min(1 - f(1 / 1000) / f(0), 0.999)
    np.testing.assert_allclose(betas[0], expected0, rtol=1e-12)


def test_schedule_identities():
    betas = get_beta_schedule(100, "linear")
    s = make_schedule(betas)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_recipm1_alphas_cumprod),
        np.sqrt(1 / acp - 1), rtol=1e-5)
    # posterior identities
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(s.posterior_variance), post_var, rtol=1e-6)
    # clipped log variance: index 0 equals index 1
    plv = np.asarray(s.posterior_log_variance_clipped)
    np.testing.assert_allclose(plv[0], plv[1])
    # fixed model variance = append(posterior_var[1], betas[1:])
    mv = np.asarray(s.model_variance)
    np.testing.assert_allclose(mv[0], post_var[1], rtol=1e-6)
    np.testing.assert_allclose(mv[1:], betas[1:], rtol=1e-6)
    # mean coefs sum: coef1 + coef2 * sqrt(acp/acp_prev) ~= identity check via
    # the standard DDPM identity: coef1 * sqrt(acp) + coef2 * ... ; use the
    # simplest invariant: posterior mean of (x0, x0 * sqrt(acp)) with eps=0
    # equals x0 * sqrt(acp_prev)
    c1 = np.asarray(s.posterior_mean_coef1)
    c2 = np.asarray(s.posterior_mean_coef2)
    # invariant: x_t = sqrt(acp)*x0 (eps = 0) => posterior mean = sqrt(acp_prev)*x0
    lhs = c1 * 1.0 + c2 * np.sqrt(acp) * 1.0
    np.testing.assert_allclose(lhs, np.sqrt(acp_prev), rtol=1e-5)


def test_schedule_is_pytree():
    import jax
    s = make_schedule(get_beta_schedule(10, "linear"))
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 16
    assert s.num_timesteps == 10


def test_edge_T_buffers_finite_and_warning_free():
    """T=1 / T=2 and degenerate beta>=1 schedules build finite buffers with no
    numpy RuntimeWarnings (reference formula yields NaN there; VERDICT r3 #7)."""
    import warnings

    for T, name in [(1, "cosine"), (2, "cosine"), (2, "linear"), (10, "linear")]:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            s = make_schedule(get_beta_schedule(T, name))
        numpy_warns = [x for x in w if "invalid value" in str(x.message)
                       or "divide by zero" in str(x.message)]
        assert not numpy_warns, (T, name, [str(x.message) for x in numpy_warns])
        for leaf_name in (
            "sqrt_alphas", "sqrt_betas", "sqrt_alphas_cumprod",
            "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
            "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
            "posterior_variance", "posterior_log_variance_clipped",
            "posterior_mean_coef1", "posterior_mean_coef2",
            "model_variance", "model_log_variance",
        ):
            arr = np.asarray(getattr(s, leaf_name))
            assert np.isfinite(arr).all(), (T, name, leaf_name, arr)
