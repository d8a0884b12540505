import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_turbulence_tpu.data import GridMap, Variable, embed_cells
from generative_turbulence_tpu.data.schema import read_metadata, find_data_files
from generative_turbulence_tpu.diffusion import DiffusionConstants, GaussianDiffusion
from generative_turbulence_tpu.diffusion.schedules import beta_schedule


def logit(x):
    return np.log(x) - np.log1p(-x)


class TestSchedules:
    def test_log_snr_linear_targets(self):
        T = 100
        betas = beta_schedule("log-snr-linear", T)
        acp = np.cumprod(1 - betas)
        # log-SNR decays linearly from log(1e3) to log(1e-5)
        assert logit(acp[0]) == pytest.approx(np.log(1e3), rel=1e-5)
        assert logit(acp[-1]) == pytest.approx(np.log(1e-5), rel=1e-5)
        log_snr = logit(acp)
        diffs = np.diff(log_snr)
        np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)

    def test_log_linear_target(self):
        T = 50
        betas = beta_schedule("log-linear", T)
        acp = np.cumprod(1 - betas)
        assert np.log(acp[-1]) == pytest.approx(np.log(1e-6), rel=1e-6)

    def test_linear(self):
        betas = beta_schedule("linear", 1000)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(2e-2)

    @pytest.mark.parametrize("name", ["cosine", "sigmoid"])
    def test_bounded(self, name):
        betas = beta_schedule(name, 200)
        assert betas.shape == (200,)
        assert np.all(betas >= 0) and np.all(betas <= 0.999)
        acp = np.cumprod(1 - betas)
        assert acp[-1] < 1e-2

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            beta_schedule("nope", 10)


class TestConstants:
    def test_identities(self):
        c = DiffusionConstants.create("log-snr-linear", 50)
        acp = np.asarray(c.alphas_cumprod, dtype=np.float64)
        np.testing.assert_allclose(
            np.asarray(c.sqrt_alphas_cumprod), np.sqrt(acp), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c.sqrt_recipm1_alphas_cumprod),
            np.sqrt(1 / acp - 1),
            rtol=1e-4,
        )
        # posterior log-var finite everywhere including t=0
        plv = np.asarray(c.posterior_log_var)
        assert np.all(np.isfinite(plv))
        # posterior mean coefficients sum to ~1 at x_start == x_t fixed point:
        # coef1 + coef2 ~ 1 when alphas ~ 1 (early steps)
        coef_sum = np.asarray(c.posterior_mean_coef1 + c.posterior_mean_coef2)
        assert coef_sum[0] == pytest.approx(1.0, abs=1e-2)

    def test_q_sample_snr(self):
        gd = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=100)
        x0 = jnp.ones((2, 4, 4, 4, 1))
        noise = jnp.zeros_like(x0)
        # at t=0, SNR=1e3 -> x_t ~ x0
        xt = gd.q_sample(x0, jnp.asarray([0, 0]), noise)
        assert float(jnp.abs(xt - x0).max()) < 0.01
        # at t=T-1, SNR=1e-5 -> x_t ~ 0 with zero noise
        xt = gd.q_sample(x0, jnp.asarray([99, 99]), noise)
        assert float(jnp.abs(xt).max()) < 0.01


@pytest.fixture(scope="module")
def small_grid(tmp_path_factory):
    from generative_turbulence_tpu.data.synthetic import generate_case

    case = tmp_path_factory.mktemp("diffcase") / "case"
    file = generate_case(case, cell_counts=(12, 8, 8), n_frames=3, seed=1)
    meta = read_metadata(file)
    return GridMap.from_metadata(meta, (Variable.U, Variable.P))


def _oracle_eps_fn(gd: GaussianDiffusion, x0: jnp.ndarray):
    """An epsilon-network that knows the true x0 (perfect denoiser)."""

    def eps_fn(x_t, t):
        return gd.predict_noise_from_start(x_t, t, x0)

    return eps_fn


class TestSampling:
    @pytest.mark.parametrize("noise_bcs", [True, False])
    def test_ddpm_oracle_recovers_x0(self, small_grid, noise_bcs):
        gd = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=60, noise_bcs=noise_bcs
        )
        rng = jax.random.PRNGKey(0)
        x0_cells = jax.random.normal(rng, (2, small_grid.n_cells, 4))
        x0 = embed_cells(x0_cells, small_grid)

        eps_fn = _oracle_eps_fn(gd, x0)
        sample = jax.jit(
            lambda r: gd.p_sample_loop(eps_fn, x0, small_grid, r)
        )(jax.random.PRNGKey(1))
        assert sample.shape == x0.shape

        inside = np.asarray(small_grid.inside_mask)[..., None]
        err = np.abs(np.asarray(sample) - np.asarray(x0))
        # in-domain cells: oracle denoising concentrates near x0
        assert (err * inside).max() < 0.25
        # non-domain cells: exact BC re-imposition
        assert (err * (1 - inside)).max() == 0.0

    def test_ddim_oracle_deterministic(self, small_grid):
        gd = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=60)
        rng = jax.random.PRNGKey(0)
        x0_cells = jax.random.normal(rng, (1, small_grid.n_cells, 4))
        x0 = embed_cells(x0_cells, small_grid)

        eps_fn = _oracle_eps_fn(gd, x0)
        sampler = jax.jit(
            lambda r: gd.ddim_sample_loop(eps_fn, x0, small_grid, r, num_steps=10)
        )
        s1 = sampler(jax.random.PRNGKey(1))

        inside = np.asarray(small_grid.inside_mask)[..., None]
        err = np.abs(np.asarray(s1) - np.asarray(x0))
        # eta=0 + oracle -> near-exact recovery in-domain
        assert (err * inside).max() < 0.05
        assert (err * (1 - inside)).max() == 0.0

    @pytest.mark.parametrize("noise_bcs", [True, False])
    def test_chunked_spans_match_single_scan(self, small_grid, noise_bcs):
        """Host-chained p_sample_span chunks must reproduce p_sample_loop
        bit-for-bit for the same rng (the chunked path exists so DDPM-500
        never issues a single ~100 s device dispatch; see p_sample_span)."""
        gd = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=23, noise_bcs=noise_bcs
        )
        rng = jax.random.PRNGKey(0)
        x0_cells = jax.random.normal(rng, (2, small_grid.n_cells, 4))
        x0 = embed_cells(x0_cells, small_grid)
        eps_fn = _oracle_eps_fn(gd, x0)

        sample_rng = jax.random.PRNGKey(3)
        full = gd.p_sample_loop(eps_fn, x0, small_grid, sample_rng)

        rng_init, rng_scan = jax.random.split(sample_rng)
        x_t = gd.p_sample_init(x0, small_grid, rng_init)
        rngs = jax.random.split(rng_scan, 23)
        span = jax.jit(
            lambda x, t_hi, r: gd.p_sample_span(eps_fn, x, x0, small_grid, t_hi, r)
        )
        C, k = 10, 0  # uneven chunks: 10 + 10 + 3
        for t_hi in range(23, 0, -C):
            n = min(C, t_hi)
            x_t = span(x_t, jnp.asarray(t_hi), rngs[k : k + n])
            k += n
        np.testing.assert_array_equal(np.asarray(x_t), np.asarray(full))

    def test_start_from_partial_noise(self, small_grid):
        gd = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=60)
        x0 = embed_cells(jnp.ones((1, small_grid.n_cells, 4)), small_grid)
        eps_fn = _oracle_eps_fn(gd, x0)
        sample = gd.p_sample_loop(
            eps_fn, x0, small_grid, jax.random.PRNGKey(2), start_from=10
        )
        inside = np.asarray(small_grid.inside_mask)[..., None]
        err = np.abs(np.asarray(sample) - np.asarray(x0))
        assert (err * inside).max() < 0.25


class TestLoss:
    def test_loss_finite_and_masked(self, small_grid):
        gd = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=20)
        x0 = embed_cells(jnp.ones((2, small_grid.n_cells, 4)), small_grid)

        # eps_fn that predicts zeros -> loss should be ~E[noise^2] = 1
        eps_fn = lambda x_t, t: jnp.zeros_like(x_t)  # noqa: E731
        loss = gd.loss(eps_fn, x0, small_grid, jax.random.PRNGKey(0))
        assert 0.5 < float(loss) < 1.5

        # perfect eps -> ~0 loss
        gd2 = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=20)
        oracle = _oracle_eps_fn(gd2, x0)
        loss2 = gd2.loss(oracle, x0, small_grid, jax.random.PRNGKey(0))
        assert float(loss2) < float(loss)

    def test_elbo_term(self, small_grid):
        gd = GaussianDiffusion.create(
            beta_schedule="log-snr-linear",
            timesteps=20,
            learned_variances=True,
            elbo_weight=0.1,
        )
        x0 = embed_cells(jnp.ones((2, small_grid.n_cells, 4)), small_grid)
        # model outputs 2x channels: eps + variance weights
        eps_fn = lambda x_t, t: jnp.concatenate(  # noqa: E731
            [jnp.zeros_like(x_t), jnp.zeros_like(x_t)], axis=-1
        )
        loss = gd.loss(eps_fn, x0, small_grid, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))

    def test_loss_gradient_flows(self, small_grid):
        gd = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=20)
        x0 = embed_cells(jnp.ones((1, small_grid.n_cells, 4)), small_grid)

        def loss_of_scale(s):
            eps_fn = lambda x_t, t: s * x_t  # noqa: E731
            return gd.loss(eps_fn, x0, small_grid, jax.random.PRNGKey(0))

        g = jax.grad(loss_of_scale)(0.5)
        assert np.isfinite(float(g)) and abs(float(g)) > 0


class TestLossWeighting:
    def test_min_snr_matches_manual_factor(self, small_grid):
        import jax.numpy as jnp

        base = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=20)
        weighted = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=20, loss_weighting="min-snr-5"
        )
        x0 = embed_cells(
            jnp.ones((2, small_grid.n_cells, 4)) * 0.3, small_grid
        )
        eps_fn = lambda x_t, t: jnp.zeros_like(x_t)  # noqa: E731
        rng = jax.random.PRNGKey(0)
        for t_val in (0, 10, 19):
            t = jnp.full((2,), t_val, dtype=jnp.int32)
            l0 = float(base.p_losses(eps_fn, x0, t, small_grid, rng))
            lw = float(weighted.p_losses(eps_fn, x0, t, small_grid, rng))
            acp = float(base.constants.alphas_cumprod[t_val])
            snr = acp / (1 - acp)
            expected = min(snr, 5.0) / snr
            assert abs(lw - l0 * expected) < 1e-5 * max(1.0, l0)

    def test_unknown_weighting_raises(self, small_grid):
        import jax.numpy as jnp
        import pytest

        gd = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=8, loss_weighting="bogus"
        )
        x0 = embed_cells(jnp.ones((1, small_grid.n_cells, 4)), small_grid)
        with pytest.raises(ValueError):
            gd.loss(lambda x, t: jnp.zeros_like(x), x0, small_grid, jax.random.PRNGKey(0))


class TestClipBounds:
    def test_envelope_clip_bounds_respected(self, small_grid):
        """x0 estimates clip to per-channel bounds (not [-1,1]) through every
        sampler path (dense-loss, DDPM scan, DDIM scan)."""
        import jax.numpy as jnp
        import numpy as np

        lo = np.array([-4.0, -4.0, -4.0, -4.0], np.float32)
        hi = np.array([6.0, 6.0, 6.0, 6.0], np.float32)
        gd = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=8, clip_denoised=True
        )
        import dataclasses as dc

        gd = dc.replace(gd, clip_bounds=(jnp.asarray(lo), jnp.asarray(hi)))
        # an eps-net that predicts huge negative noise -> x0 explodes upward
        eps_fn = lambda x_t, t: -50.0 * jnp.ones_like(x_t)  # noqa: E731
        x_bcs = embed_cells(jnp.ones((1, small_grid.n_cells, 4)) * 2.0, small_grid)
        rng = jax.random.PRNGKey(0)
        for sample in (
            lambda: gd.p_sample_loop(eps_fn, x_bcs, small_grid, rng),
            lambda: gd.ddim_sample_loop(eps_fn, x_bcs, small_grid, rng, num_steps=4),
        ):
            x = np.asarray(sample())
            inside = np.asarray(small_grid.inside_mask)
            assert x[:, inside].max() <= hi.max() + 1e-4
            # without per-channel bounds the unit clip would cap at 1.0;
            # the envelope clip must allow values above 1
            assert x[:, inside].max() > 1.5
