"""Golden-value checks of the diffusion algebra against the closed-form
definitions (independent re-derivations, not the implementation's own code)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_turbulence_tpu.diffusion import DiffusionConstants, GaussianDiffusion


@pytest.fixture(scope="module")
def gd():
    return GaussianDiffusion.create(beta_schedule="cosine", timesteps=32)


def _acp(gd):
    return np.asarray(gd.constants.alphas_cumprod, dtype=np.float64)


def test_posterior_coefficients_formula(gd):
    """Posterior q(x_{t-1} | x_t, x_0) coefficients from the DDPM paper:
    mu = [beta_t sqrt(acp_{t-1}) x0 + (1-acp_{t-1}) sqrt(alpha_t) x_t]/(1-acp_t)."""
    c = gd.constants
    betas = np.asarray(c.betas, dtype=np.float64)
    acp = _acp(gd)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    alphas = 1 - betas

    coef1 = betas * np.sqrt(acp_prev) / (1 - acp)
    coef2 = (1 - acp_prev) * np.sqrt(alphas) / (1 - acp)
    np.testing.assert_allclose(np.asarray(c.posterior_mean_coef1), coef1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c.posterior_mean_coef2), coef2, rtol=1e-5)

    # posterior variance: beta_t * (1 - acp_{t-1}) / (1 - acp_t), t >= 1
    var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(
        np.exp(np.asarray(c.posterior_log_var))[1:], var[1:], rtol=1e-4
    )


def test_noise_reconstruction_inverse(gd):
    """predict_start_from_noise and predict_noise_from_start invert each other."""
    rng = jax.random.PRNGKey(0)
    x_t = jax.random.normal(rng, (2, 4, 4, 4, 3))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x_t.shape)
    t = jnp.asarray([5, 20])

    x0 = gd.predict_start_from_noise(x_t, t, noise)
    noise_back = gd.predict_noise_from_start(x_t, t, x0)
    np.testing.assert_allclose(np.asarray(noise_back), np.asarray(noise), rtol=1e-3, atol=1e-4)


def test_q_sample_statistics(gd):
    """q(x_t | x_0) has mean sqrt(acp_t) x0 and variance (1 - acp_t)."""
    rng = jax.random.PRNGKey(0)
    x0 = jnp.full((1, 8, 8, 8, 2), 3.0)
    t = jnp.asarray([10])
    acp_t = _acp(gd)[10]

    samples = []
    for i in range(64):
        noise = jax.random.normal(jax.random.fold_in(rng, i), x0.shape)
        samples.append(np.asarray(gd.q_sample(x0, t, noise)))
    samples = np.stack(samples)
    assert samples.mean() == pytest.approx(3.0 * np.sqrt(acp_t), rel=0.02)
    assert samples.var() == pytest.approx(1 - acp_t, rel=0.1)


def test_posterior_contracts_to_x0(gd):
    """At t=0 the posterior mean is dominated by the x0 estimate."""
    c = gd.constants
    coef1 = float(c.posterior_mean_coef1[0])
    coef2 = float(c.posterior_mean_coef2[0])
    assert coef1 > 0.9 and coef1 + coef2 == pytest.approx(1.0, abs=0.05)


def test_constants_dtype_and_shapes():
    c = DiffusionConstants.create("log-snr-linear", 17)
    for leaf in jax.tree_util.tree_leaves(c):
        assert leaf.shape == (17,)
        assert leaf.dtype == jnp.float32
    assert c.num_timesteps == 17
