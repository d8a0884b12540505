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


class TestVParameterization:
    def test_v_algebra_inversions(self, gd):
        gdv = GaussianDiffusion.create(
            beta_schedule="cosine", timesteps=32, parameterization="v"
        )
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.normal(rng, (2, 4, 4, 4, 3))
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        t = jnp.asarray([5, 25])

        x_t = gdv.q_sample(x0, t, noise)
        v = gdv.v_from_start_and_noise(x0, t, noise)
        x0_back = gdv.predict_start_from_v(x_t, t, v)
        eps_back = gdv.predict_noise_from_v(x_t, t, v)
        np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(eps_back), np.asarray(noise), rtol=1e-4, atol=1e-5)

    def test_v_oracle_sampling(self, small_grid_v):
        from generative_turbulence_tpu.data import embed_cells

        gdv = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=40, parameterization="v"
        )
        rng = jax.random.PRNGKey(0)
        x0 = embed_cells(
            jax.random.normal(rng, (1, small_grid_v.n_cells, 4)), small_grid_v
        )

        def oracle_v_fn(x_t, t):
            # eps implied by the true x0, converted to the v target
            eps = gdv.predict_noise_from_start(x_t, t, x0)
            return gdv.v_from_start_and_noise(x0, t, eps)

        sample = jax.jit(
            lambda r: gdv.p_sample_loop(oracle_v_fn, x0, small_grid_v, r)
        )(jax.random.PRNGKey(1))
        inside = np.asarray(small_grid_v.inside_mask)[..., None]
        err = np.abs(np.asarray(sample) - np.asarray(x0))
        assert (err * inside).max() < 0.25
        assert (err * (1 - inside)).max() == 0.0

    def test_v_loss_uses_v_target(self, small_grid_v):
        from generative_turbulence_tpu.data import embed_cells

        gdv = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=20, parameterization="v"
        )
        x0 = embed_cells(jnp.ones((2, small_grid_v.n_cells, 4)), small_grid_v)

        # an oracle v-network gives ~zero loss; a zero network does not
        def oracle_v_fn(x_t, t):
            eps = gdv.predict_noise_from_start(x_t, t, x0)
            return gdv.v_from_start_and_noise(x0, t, eps)

        loss_oracle = float(
            gdv.loss(oracle_v_fn, x0, small_grid_v, jax.random.PRNGKey(0))
        )
        loss_zero = float(
            gdv.loss(lambda x, t: jnp.zeros_like(x), x0, small_grid_v, jax.random.PRNGKey(0))
        )
        assert loss_oracle < 1e-8
        assert loss_zero > 0.1


@pytest.fixture(scope="module")
def small_grid_v(tmp_path_factory):
    from generative_turbulence_tpu.data import GridMap, Variable
    from generative_turbulence_tpu.data.schema import read_metadata
    from generative_turbulence_tpu.data.synthetic import generate_case

    case = tmp_path_factory.mktemp("vcase") / "case"
    file = generate_case(case, cell_counts=(10, 8, 8), n_frames=2, seed=2)
    return GridMap.from_metadata(read_metadata(file), (Variable.U, Variable.P))
