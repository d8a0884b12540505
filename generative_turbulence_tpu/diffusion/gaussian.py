"""Gaussian diffusion core: forward process, losses, DDPM and DDIM samplers.

Functional re-design of ``turbdiff/models/ddpm.py:620-882``.  The process
constants live in a ``DiffusionConstants`` pytree (float32, computed in f64);
the sampler is a single ``lax.scan`` over timesteps so 500 U-Net evaluations
compile to one XLA loop, and a DDIM sampler (subsequence stepping, an addition
over the reference) provides the fast path.

Boundary-condition handling (the paper's key mechanism):
- ``noise_bcs=False``: noise only in-domain cells and pin BC cells to their
  clean values at every step.
- ``noise_bcs=True`` (the shapes default): BC cells are noised too and
  re-sampled from q(x_t | x_bcs) after every ancestral step.
Either way the final sample gets the exact BC values re-imposed.

The epsilon-network enters as a closure ``eps_fn(x_t, t) -> model_output`` so
the same math serves training, sampling, and any network architecture.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.grid import GridMap, masked_mean
from .schedules import beta_schedule


def _bcast(coefs: jnp.ndarray, t: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast right against ``like``."""
    vals = coefs[t]
    return vals.reshape(vals.shape + (1,) * (like.ndim - vals.ndim))


class ModelPrediction(NamedTuple):
    noise: jnp.ndarray
    x_start: jnp.ndarray
    mean: jnp.ndarray
    log_var: jnp.ndarray
    raw: jnp.ndarray  # the network head (epsilon or v, per parameterization)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionConstants:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    log_betas: jnp.ndarray
    posterior_log_var: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    def tree_flatten(self):
        return dataclasses.astuple(self), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @staticmethod
    def create(schedule: str, timesteps: int) -> "DiffusionConstants":
        betas = beta_schedule(schedule, timesteps)  # float64
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.concatenate([[1.0], acp[:-1]])

        log_betas = np.log(betas)
        # Numerically stable log posterior variance via log1p; the t=0 entry
        # (log1p(-1) = -inf) is extrapolated so it is finite
        # (reference ``ddpm.py:684-700``).
        with np.errstate(divide="ignore"):
            post_log_var = log_betas + np.log1p(-acp_prev) - np.log1p(-acp)
        post_log_var[0] = log_betas[0] * (post_log_var[1] / log_betas[1])

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)  # noqa: E731
        return DiffusionConstants(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(1.0 / np.sqrt(acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            log_betas=f32(log_betas),
            posterior_log_var=f32(post_log_var),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        )


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )


def normal_log_likelihood(x, mean, log_var):
    log_2pi = float(np.log(2 * np.pi))
    return -0.5 * (log_var + log_2pi + (x - mean) ** 2 * jnp.exp(-log_var))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Diffusion process configuration + math.  Stateless; pairs constants with
    the behavioral flags of the reference's ``GaussianDiffusion``."""

    constants: DiffusionConstants
    loss_type: str = "l2"
    clip_denoised: bool = False
    noise_bcs: bool = True
    learned_variances: bool = False
    elbo_weight: Optional[float] = None
    detach_elbo_mean: bool = True
    # "epsilon" (reference behavior) or "v" (Salimans & Ho progressive
    # distillation parameterization; an addition over the reference)
    parameterization: str = "epsilon"
    # Optional per-timestep loss weighting (addition over the reference's
    # uniform eps-loss): "min-snr-<gamma>" (Hang et al. 2023) balances the
    # effective x0-space weight across noise levels — w = min(SNR, g)/SNR
    # for eps-prediction, min(SNR, g)/(SNR + 1) for v-prediction.
    loss_weighting: Optional[str] = None
    # clip_denoised bounds in NORMALIZED space: None = the reference's
    # [-1, 1]; otherwise per-channel (lo, hi) of shape (F,) — the training
    # set's normalized envelope, so normalizations that don't map data into
    # [-1, 1] (e.g. mean-std) clip to the data range instead of into it.
    clip_bounds: Optional[tuple] = None

    @staticmethod
    def create(
        *,
        beta_schedule: str = "log-snr-linear",
        timesteps: int = 500,
        loss_type: str = "l2",
        clip_denoised: bool = False,
        noise_bcs: bool = True,
        learned_variances: bool = False,
        elbo_weight: Optional[float] = None,
        detach_elbo_mean: bool = True,
        parameterization: str = "epsilon",
        loss_weighting: Optional[str] = None,
    ) -> "GaussianDiffusion":
        assert parameterization in ("epsilon", "v")
        return GaussianDiffusion(
            constants=DiffusionConstants.create(beta_schedule, timesteps),
            loss_type=loss_type,
            clip_denoised=clip_denoised,
            noise_bcs=noise_bcs,
            learned_variances=learned_variances,
            elbo_weight=elbo_weight,
            detach_elbo_mean=detach_elbo_mean,
            parameterization=parameterization,
            loss_weighting=loss_weighting,
        )

    @property
    def num_timesteps(self) -> int:
        return self.constants.num_timesteps

    # ---- forward process ---------------------------------------------------

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
        c = self.constants
        return (
            _bcast(c.sqrt_alphas_cumprod, t, x_start) * x_start
            + _bcast(c.sqrt_one_minus_alphas_cumprod, t, x_start) * noise
        )

    # ---- reconstructions ---------------------------------------------------

    def predict_start_from_noise(self, x_t, t, noise):
        c = self.constants
        return (
            _bcast(c.sqrt_recip_alphas_cumprod, t, x_t) * x_t
            - _bcast(c.sqrt_recipm1_alphas_cumprod, t, x_t) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        c = self.constants
        return (
            _bcast(c.sqrt_recip_alphas_cumprod, t, x_t) * x_t - x0
        ) / _bcast(c.sqrt_recipm1_alphas_cumprod, t, x_t)

    def q_posterior(self, x_start, x_t, t):
        c = self.constants
        mean = (
            _bcast(c.posterior_mean_coef1, t, x_t) * x_start
            + _bcast(c.posterior_mean_coef2, t, x_t) * x_t
        )
        log_var = _bcast(c.posterior_log_var, t, x_t)
        return mean, log_var

    # v-parameterization algebra: with x_t = a x0 + s eps (a = sqrt(acp),
    # s = sqrt(1 - acp)) the target is v = a eps - s x0, and
    # x0 = a x_t - s v,  eps = s x_t + a v.

    def v_from_start_and_noise(self, x_start, t, noise):
        c = self.constants
        a = _bcast(c.sqrt_alphas_cumprod, t, x_start)
        s = _bcast(c.sqrt_one_minus_alphas_cumprod, t, x_start)
        return a * noise - s * x_start

    def predict_start_from_v(self, x_t, t, v):
        c = self.constants
        a = _bcast(c.sqrt_alphas_cumprod, t, x_t)
        s = _bcast(c.sqrt_one_minus_alphas_cumprod, t, x_t)
        return a * x_t - s * v

    def predict_noise_from_v(self, x_t, t, v):
        c = self.constants
        a = _bcast(c.sqrt_alphas_cumprod, t, x_t)
        s = _bcast(c.sqrt_one_minus_alphas_cumprod, t, x_t)
        return s * x_t + a * v

    def model_predictions(
        self,
        eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        grid: GridMap,
        inside: Optional[jnp.ndarray] = None,
        clip_bounds: Optional[tuple] = None,
    ) -> ModelPrediction:
        """``inside`` overrides the dense in-domain mask (the flat-state
        sampler passes a flattened one broadcastable against its state);
        ``clip_bounds`` likewise overrides the dense per-channel clip
        envelope with a layout-matched one."""
        if inside is None:
            inside = grid.inside_mask[..., None]
        if clip_bounds is None:
            clip_bounds = self.clip_bounds  # (F,) broadcasts over dense x
        c = self.constants
        out = eps_fn(x_t, t)
        if self.learned_variances:
            raw, var_weights = jnp.split(out, 2, axis=-1)
            log_betas = _bcast(c.log_betas, t, var_weights)
            post_log_var = _bcast(c.posterior_log_var, t, var_weights)
            # sigmoid-lerp between beta and posterior log-variance
            # (improved-DDPM style, ``ddpm.py:730-743``)
            w = jax.nn.sigmoid(var_weights)
            log_var = log_betas + w * (post_log_var - log_betas)
        else:
            raw = out
            log_var = _bcast(c.log_betas, t, x_t)

        if self.parameterization == "v":
            x_start = self.predict_start_from_v(x_t, t, raw)
            pred_noise = self.predict_noise_from_v(x_t, t, raw)
        else:
            pred_noise = raw
            x_start = self.predict_start_from_noise(x_t, t, pred_noise)
        if not self.noise_bcs:
            # Pin the prediction to the (clean) BC values carried by x_t.
            x_start = jnp.where(inside, x_start, x_t)
        if self.clip_denoised:
            if clip_bounds is not None:
                lo, hi = clip_bounds
                x_start = jnp.clip(
                    x_start,
                    jnp.asarray(lo, x_start.dtype),
                    jnp.asarray(hi, x_start.dtype),
                )
            else:
                x_start = jnp.clip(x_start, -1.0, 1.0)

        mean, _ = self.q_posterior(x_start, x_t, t)
        return ModelPrediction(pred_noise, x_start, mean, log_var, raw)

    # ---- training loss -----------------------------------------------------

    def p_losses(
        self,
        eps_fn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        grid: GridMap,
        rng: jax.Array,
    ):
        inside = grid.inside_mask[..., None]
        noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        if not self.noise_bcs:
            x_t = jnp.where(inside, x_t, x_start)

        pred = self.model_predictions(eps_fn, x_t, t, grid)

        if self.parameterization == "v":
            target = self.v_from_start_and_noise(x_start, t, noise)
        else:
            target = noise
        if self.loss_type == "l2":
            err = (pred.raw - target) ** 2
        elif self.loss_type == "l1":
            err = jnp.abs(pred.raw - target)
        else:
            raise ValueError(f"Invalid loss type {self.loss_type!r}")

        # Mean over in-domain cells only (``ddpm.py:845-850``); masked_mean
        # normalizes by the TRUE cell count as a traced scalar so bucketed
        # cases share one compiled program.
        per_sample = masked_mean(err, grid)
        if self.loss_weighting is not None:
            if not self.loss_weighting.startswith("min-snr-"):
                raise ValueError(f"Unknown loss weighting {self.loss_weighting!r}")
            gamma = float(self.loss_weighting[len("min-snr-"):])
            acp = self.constants.alphas_cumprod[t]
            snr = acp / (1.0 - acp)
            denom = snr + 1.0 if self.parameterization == "v" else snr
            per_sample = per_sample * (jnp.minimum(snr, gamma) / denom)
        loss = per_sample.mean()

        if self.elbo_weight is not None and self.learned_variances:
            true_mean, true_log_var = self.q_posterior(x_start, x_t, t)
            model_mean = pred.mean
            if self.detach_elbo_mean:
                model_mean = jax.lax.stop_gradient(model_mean)
            kl = normal_kl(true_mean, true_log_var, model_mean, pred.log_var)
            log_lk = normal_log_likelihood(x_t, model_mean, pred.log_var)
            kl_b = masked_mean(kl, grid)
            ll_b = masked_mean(log_lk, grid)
            elbo = jnp.where(t == 0, -ll_b, kl_b)
            loss = loss + self.elbo_weight * elbo.mean()

        return loss

    def loss(self, eps_fn, x_start: jnp.ndarray, grid: GridMap, rng: jax.Array):
        """Draw t ~ U[0, T) per batch element and compute the training loss."""
        rng_t, rng_noise = jax.random.split(rng)
        t = jax.random.randint(
            rng_t, (x_start.shape[0],), 0, self.num_timesteps, dtype=jnp.int32
        )
        return self.p_losses(eps_fn, x_start, t, grid, rng_noise)

    # ---- ancestral (DDPM) sampling ------------------------------------------

    def _flat_sampler_views(self, eps_fn, x_bcs: jnp.ndarray, grid: GridMap):
        """Flattened (B, N) views for the sampler state.

        The dense state (B, X, Y, Z, F) pads F=4 channels to 128 TPU lanes —
        up to 32x HBM traffic on every elementwise op of the diffusion
        algebra, which dominates the non-UNet part of a sampling step.  The
        scan therefore carries (B, X*Y*Z*F): near-zero lane padding.  The
        state is densified only for the eps-network call (one layout change
        each way per step, instead of padded traffic on every op).
        """
        shape = x_bcs.shape
        B = shape[0]

        def flat_eps(x_flat, t):
            out = eps_fn(x_flat.reshape(shape), t)
            if self.learned_variances:
                raw, w = jnp.split(out, 2, axis=-1)
                return jnp.concatenate(
                    [raw.reshape(B, -1), w.reshape(B, -1)], axis=-1
                )
            return out.reshape(B, -1)

        inside_flat = jnp.broadcast_to(
            grid.inside_mask[..., None], shape[1:]
        ).reshape(-1)
        bounds_flat = None
        if self.clip_denoised and self.clip_bounds is not None:
            lo, hi = self.clip_bounds
            bounds_flat = (
                jnp.broadcast_to(jnp.asarray(lo), shape[1:]).reshape(-1),
                jnp.broadcast_to(jnp.asarray(hi), shape[1:]).reshape(-1),
            )
        return flat_eps, x_bcs.reshape(B, -1), inside_flat, bounds_flat

    def p_sample_loop(
        self,
        eps_fn,
        x_bcs: jnp.ndarray,
        grid: GridMap,
        rng: jax.Array,
        start_from: Optional[int] = None,
    ) -> jnp.ndarray:
        """Full ancestral sampling as one ``lax.scan`` over timesteps.

        x_bcs carries the boundary values (a grid embedding of any frame — only
        its non-domain cells matter).  ``start_from`` begins from a partially
        noised x_bcs at that timestep instead of pure noise.  The scan state
        is kept flat (see ``_flat_sampler_views``).
        """
        out_shape = x_bcs.shape
        B = out_shape[0]
        T = self.num_timesteps if start_from is None else int(start_from)
        eps_fn, x_bcs, inside, bounds = self._flat_sampler_views(eps_fn, x_bcs, grid)

        rng_init, rng_scan = jax.random.split(rng)
        if start_from is None:
            x_t = jax.random.normal(rng_init, x_bcs.shape, dtype=x_bcs.dtype)
        else:
            t0 = jnp.full((B,), T - 1, dtype=jnp.int32)
            x_t = self.q_sample(
                x_bcs, t0, jax.random.normal(rng_init, x_bcs.shape, dtype=x_bcs.dtype)
            )
        if not self.noise_bcs:
            x_t = jnp.where(inside, x_t, x_bcs)

        ts = jnp.arange(T - 1, -1, -1)
        rngs = jax.random.split(rng_scan, T)
        step = self._p_step(eps_fn, x_bcs, inside, grid, B, bounds)
        x_t, _ = jax.lax.scan(step, x_t, (ts, rngs))

        # Impose the exact BC values regardless of the noising mode.
        return jnp.where(inside, x_t, x_bcs).reshape(out_shape)

    def _p_step(self, eps_fn, x_bcs: jnp.ndarray, inside: jnp.ndarray, grid: GridMap, B: int, bounds=None):
        """One ancestral step over the flat state (shared by the single-scan
        and chunked samplers)."""

        def step(x_t, scan_in):
            t_scalar, rng_t = scan_in
            t = jnp.full((B,), t_scalar, dtype=jnp.int32)
            pred = self.model_predictions(
                eps_fn, x_t, t, grid, inside=inside, clip_bounds=bounds
            )

            rng_noise, rng_bc = jax.random.split(rng_t)
            noise = jax.random.normal(rng_noise, x_t.shape, dtype=x_t.dtype)
            if not self.noise_bcs:
                noise = jnp.where(inside, noise, 0.0)
            std = jnp.exp(pred.log_var / 2)
            x_next = pred.mean + std * noise

            if self.noise_bcs:
                # Re-sample boundary cells from q(x_t | x_bcs) at this level.
                bc_noise = jax.random.normal(rng_bc, x_t.shape, dtype=x_t.dtype)
                x_bc_t = self.q_sample(x_bcs, t, bc_noise)
                x_next = jnp.where(inside, x_next, x_bc_t)

            # At t == 0 return the predicted mean instead of a sample.
            x_next = jnp.where(t_scalar == 0, pred.mean, x_next)
            return x_next, None

        return step

    def p_sample_init(
        self, x_bcs: jnp.ndarray, grid: GridMap, rng: jax.Array
    ) -> jnp.ndarray:
        """Initial x_T (dense) for chunked ancestral sampling; matches the
        init of :meth:`p_sample_loop` exactly for the same rng."""
        _, x_bcs_f, inside, _ = self._flat_sampler_views(lambda x, t: x, x_bcs, grid)
        x_t = jax.random.normal(rng, x_bcs_f.shape, dtype=x_bcs_f.dtype)
        if not self.noise_bcs:
            x_t = jnp.where(inside, x_t, x_bcs_f)
        return x_t.reshape(x_bcs.shape)

    def p_sample_span(
        self,
        eps_fn,
        x_t: jnp.ndarray,
        x_bcs: jnp.ndarray,
        grid: GridMap,
        t_hi: jnp.ndarray,
        rngs: jax.Array,
    ) -> jnp.ndarray:
        """Run ``len(rngs)`` ancestral steps from timestep ``t_hi - 1`` down.

        Dense state in/out.  ``t_hi`` may be a traced scalar, so ONE compiled
        span program serves every chunk position; ``rngs`` must be the
        corresponding slice of ``jax.random.split(rng_scan, T)`` — chaining
        spans over all T steps then reproduces :meth:`p_sample_loop`
        bit-for-bit for the same top-level rng.  Exists because a full
        DDPM-500 scan is a single ~100 s device dispatch, which remote-
        dispatch runtimes (the axon tunnel) kill; chunks keep each dispatch
        short (reference protocol: ``turbdiff/models/ddpm.py:767-816`` —
        per-step python loop, no such constraint).

        When the span reaches t = 0 the exact boundary values are imposed.
        """
        span = rngs.shape[0]
        out_shape = x_bcs.shape
        eps_fn, x_bcs_f, inside, bounds = self._flat_sampler_views(eps_fn, x_bcs, grid)
        B = out_shape[0]
        x_flat = x_t.reshape(x_bcs_f.shape)
        ts = t_hi - 1 - jnp.arange(span)
        step = self._p_step(eps_fn, x_bcs_f, inside, grid, B, bounds)
        x_flat, _ = jax.lax.scan(step, x_flat, (ts, rngs))
        x_flat = jnp.where(
            t_hi - span <= 0, jnp.where(inside, x_flat, x_bcs_f), x_flat
        )
        return x_flat.reshape(out_shape)

    # ---- DDIM sampling (fast path; addition over the reference) -------------

    def ddim_sample_loop(
        self,
        eps_fn,
        x_bcs: jnp.ndarray,
        grid: GridMap,
        rng: jax.Array,
        *,
        num_steps: int = 50,
        eta: float = 0.0,
    ) -> jnp.ndarray:
        """DDIM sampling over an evenly spaced timestep subsequence.

        eta = 0 gives deterministic DDIM; eta = 1 recovers ancestral variance
        on the subsequence.  The scan state is kept flat (see
        ``_flat_sampler_views``).
        """
        c = self.constants
        out_shape = x_bcs.shape
        B = out_shape[0]
        T = self.num_timesteps
        eps_fn, x_bcs, inside, bounds = self._flat_sampler_views(eps_fn, x_bcs, grid)

        taus = np.linspace(0, T - 1, num_steps).round().astype(np.int32)
        taus_prev = np.concatenate([[-1], taus[:-1]]).astype(np.int32)
        acp = jnp.concatenate([jnp.ones((1,), c.alphas_cumprod.dtype), c.alphas_cumprod])
        # acp[i+1] = alpha_bar_i; acp[0] = 1 for the virtual step t=-1

        rng_init, rng_scan = jax.random.split(rng)
        x_t = jax.random.normal(rng_init, x_bcs.shape, dtype=x_bcs.dtype)
        if not self.noise_bcs:
            x_t = jnp.where(inside, x_t, x_bcs)

        def step(x_t, scan_in):
            tau, tau_prev, rng_t = scan_in
            t = jnp.full((B,), tau, dtype=jnp.int32)
            pred = self.model_predictions(
                eps_fn, x_t, t, grid, inside=inside, clip_bounds=bounds
            )
            x0 = pred.x_start
            # Re-derive the noise consistent with the (possibly clipped/pinned)
            # x0 so the update stays on the DDIM trajectory.
            eps = self.predict_noise_from_start(x_t, t, x0)

            a_t = acp[tau + 1]
            a_prev = acp[tau_prev + 1]
            sigma = (
                eta
                * jnp.sqrt((1 - a_prev) / (1 - a_t))
                * jnp.sqrt(1 - a_t / a_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * eps

            rng_noise, rng_bc = jax.random.split(rng_t)
            noise = jax.random.normal(rng_noise, x_t.shape, dtype=x_t.dtype)
            if not self.noise_bcs:
                noise = jnp.where(inside, noise, 0.0)
            x_next = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise
            # Final step (tau_prev == -1) keeps the clean estimate.
            x_next = jnp.where(tau_prev < 0, jnp.sqrt(a_prev) * x0, x_next)

            if self.noise_bcs:
                bc_noise = jax.random.normal(rng_bc, x_t.shape, dtype=x_t.dtype)
                t_prev = jnp.maximum(tau_prev, 0)
                x_bc = self.q_sample(
                    x_bcs, jnp.full((B,), t_prev, dtype=jnp.int32), bc_noise
                )
                x_bc = jnp.where(tau_prev < 0, x_bcs, x_bc)
                x_next = jnp.where(inside, x_next, x_bc)
            else:
                x_next = jnp.where(inside, x_next, x_bcs)
            return x_next, None

        rngs = jax.random.split(rng_scan, num_steps)
        x_t, _ = jax.lax.scan(
            step, x_t, (jnp.asarray(taus[::-1].copy()), jnp.asarray(taus_prev[::-1].copy()), rngs)
        )
        return jnp.where(inside, x_t, x_bcs).reshape(out_shape)
