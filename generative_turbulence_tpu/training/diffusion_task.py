"""The diffusion training task: wires normalization + conditioning +
DenoisingModel + GaussianDiffusion into jitted train/sample steps.

Equivalent role to ``turbdiff/models/diffusion.py:41-242`` (DiffusionTraining),
re-designed functional: one jitted ``train_step`` (donated state), one jitted
sampler per (sampler kind, batch shape), explicit RNG threading, sharding via
the (dp, sp) mesh from ``parallel.mesh``.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax.training.train_state import TrainState


class DiffusionState(TrainState):
    """TrainState + optional EMA parameters used for sampling."""

    ema_params: Optional[dict] = struct.field(pytree_node=True, default=None)

from ..data.dataset import Batch
from ..data.grid import GridMap, embed_cells, gather_cells
from ..data.schema import FieldStats
from ..data.variables import Variable, total_dims
from ..diffusion import GaussianDiffusion
from ..eval.metrics import SampleMetricsCollection
from ..eval.sample_store import SampleStore
from ..models import Conditioning, DenoisingModel, Normalizer
from ..parallel.mesh import constrain_dense, shard_batch_arrays
from .config import ModelConfig
from .optimizers import build_optimizer


class DiffusionTask:
    def __init__(
        self,
        cfg: ModelConfig,
        stats: FieldStats,
        data_root: Path,
        samples_root: Path,
        *,
        max_train_steps: int = 1,
        gradient_clip_val: float = 0.1,
        mesh=None,
        wasserstein_solver: str = "sinkhorn",
    ):
        """``data_root`` is the dataset root containing the val/ and test/
        split directories (each metric collection reads the ground truth of
        its own split)."""
        self.cfg = cfg
        self.mesh = mesh
        self.variables = Variable.parse_tuple(cfg.variables)
        assert Variable.U in self.variables
        self.normalizer = Normalizer.from_stats(
            stats, self.variables, cfg.normalization_mode
        )
        self.monitor = cfg.monitor

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        n_features = total_dims(self.variables)

        def build_net(net_dtype):
            conditioning = None
            if cfg.cell_type_features or cfg.cell_pos_features:
                conditioning = Conditioning(
                    cell_type_features=cfg.cell_type_features,
                    cell_type_embedding=cfg.cell_type_embedding_type,
                    cell_type_embedding_dim=cfg.cell_type_embedding_dim,
                    cell_pos_features=cfg.cell_pos_features,
                    dtype=net_dtype,
                )
            return DenoisingModel(
                out_features=n_features * (2 if cfg.learned_variances else 1),
                timesteps=cfg.timesteps,
                dim=cfg.dim,
                u_net_levels=cfg.u_net_levels,
                actfn_name=cfg.actfn,
                norm_type=cfg.norm_type,
                time_embedding=cfg.time_embedding,
                attention_kind=cfg.attention_kind,
                with_geometry_embedding=cfg.with_geometry_embedding,
                remat=cfg.remat,
                conditioning=conditioning,
                dtype=net_dtype,
            )

        self.net = build_net(dtype)
        # Sampling can run at a different compute dtype than training: params
        # are stored float32 (flax param_dtype default), so the same pytree
        # applies through either module (dtype only casts activations).
        eval_dtype = (
            dtype
            if cfg.eval_compute_dtype is None
            else (jnp.bfloat16 if cfg.eval_compute_dtype == "bfloat16" else None)
        )
        self.eval_net = self.net if eval_dtype == dtype else build_net(eval_dtype)
        self.diffusion = GaussianDiffusion.create(
            beta_schedule=cfg.beta_schedule,
            timesteps=cfg.timesteps,
            loss_type=cfg.loss,
            clip_denoised=cfg.clip_denoised,
            noise_bcs=cfg.noise_bcs,
            learned_variances=cfg.learned_variances,
            elbo_weight=cfg.elbo_weight if cfg.learned_variances else None,
            detach_elbo_mean=cfg.detach_elbo_mean,
            parameterization=cfg.parameterization,
            loss_weighting=cfg.loss_weighting,
        )
        if cfg.clip_denoised and cfg.clip_mode == "envelope":
            import dataclasses as _dc

            lo, hi = stats.envelope(self.variables)
            self.diffusion = _dc.replace(
                self.diffusion,
                clip_bounds=(
                    self.normalizer.normalize(lo.astype(np.float32)),
                    self.normalizer.normalize(hi.astype(np.float32)),
                ),
            )
        elif cfg.clip_mode not in ("unit", "envelope"):
            raise ValueError(f"Unknown clip_mode {cfg.clip_mode!r}")
        self.tx = build_optimizer(
            optimizer=cfg.optimizer,
            learning_rate=cfg.learning_rate,
            min_learning_rate=cfg.min_learning_rate,
            lr_decay=cfg.lr_decay,
            max_train_steps=max_train_steps,
            gradient_clip_val=gradient_clip_val,
            accumulate_steps=cfg.accumulate_steps,
        )

        self.val_sample_store = SampleStore(
            Path(samples_root) / "val-samples.h5", self.variables
        )
        self.test_sample_store = SampleStore(
            Path(samples_root) / "test-samples.h5", self.variables
        )
        data_root = Path(data_root)
        self.val_metrics = SampleMetricsCollection(
            "val",
            data_root / "val",
            SampleMetricsCollection.default_metrics(wasserstein_solver),
        )
        self.test_metrics = SampleMetricsCollection(
            "test",
            data_root / "test",
            SampleMetricsCollection.default_metrics(wasserstein_solver),
        )

    # ---- state -------------------------------------------------------------

    def init_state(self, rng: jax.Array, batch: Batch) -> DiffusionState:
        # No sharding constraint at init: the example batch of 1 need not be
        # divisible by the dp axis.
        x = self._model_input(
            jnp.asarray(batch.cells[:1]), batch.grid, constrain=False
        )
        t = jnp.zeros((1,), dtype=jnp.int32)
        # jit the init: eager flax init is pathologically slow on remote TPUs
        params = jax.jit(self.net.init)(rng, x, t, batch.grid.cell_types)
        # EMA must hold its OWN buffers: sharing with params would donate the
        # same buffer twice in the donated train step.
        ema = (
            jax.tree_util.tree_map(jnp.copy, params)
            if self.cfg.ema_decay > 0
            else None
        )
        return DiffusionState.create(
            apply_fn=self.net.apply, params=params, tx=self.tx, ema_params=ema
        )

    def n_params(self, state: TrainState) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(state.params))

    # ---- jitted steps --------------------------------------------------------

    def _model_input(
        self, cells: jnp.ndarray, grid: GridMap, *, constrain: bool = True
    ) -> jnp.ndarray:
        dense = embed_cells(cells, grid)
        if constrain:
            dense = constrain_dense(self.mesh, dense)
        return self.normalizer.normalize(dense)

    def _eps_fn(self, params, grid: GridMap, net=None):
        net = self.net if net is None else net

        def eps_fn(x_t, t):
            return net.apply(params, x_t, t, grid.cell_types)

        return eps_fn

    @functools.cached_property
    def train_step(self):
        ema_decay = self.cfg.ema_decay
        accumulate_steps = max(1, int(self.cfg.accumulate_steps))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: DiffusionState, cells: jnp.ndarray, grid: GridMap, rng: jax.Array):
            x = self._model_input(cells, grid)

            def loss_fn(params):
                return self.diffusion.loss(self._eps_fn(params, grid), x, grid, rng)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            if ema_decay > 0 and state.ema_params is not None:
                # Warmed-up EMA: with a fixed decay d the random init keeps
                # d^t of the weight (0.999^600 = 0.55 — the EMA samples half
                # from an untrained net for the first ~1k steps).  Ramping the
                # decay as (1+t)/(10+t) makes the EMA an unbiased running
                # average early and the asymptotic d later.
                #
                # With optax.MultiSteps (accumulate_steps > 1) state.step
                # counts micro-steps while params only change on emission
                # steps, so: warm-up t counts REAL updates, and the EMA blend
                # is a no-op (decay 1.0) on non-emission micro-steps.
                t = (state.step // accumulate_steps).astype(jnp.float32)
                decay_t = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
                if accumulate_steps > 1:
                    emitted = (state.step % accumulate_steps) == 0
                    decay_t = jnp.where(emitted, decay_t, 1.0)
                ema = jax.tree_util.tree_map(
                    # Blend in f32 and cast back so non-f32 EMA leaves keep
                    # their dtype (decay_t * e would promote them to f32 and
                    # change the donated-state output pytree).
                    lambda e, p: (
                        decay_t * e.astype(jnp.float32)
                        + (1.0 - decay_t) * p.astype(jnp.float32)
                    ).astype(e.dtype),
                    state.ema_params,
                    state.params,
                )
                state = state.replace(ema_params=ema)
            return state, {"train/loss": loss}

        return step

    def _sampling_params(self, state):
        ema = getattr(state, "ema_params", None)
        return ema if ema is not None else state.params

    @functools.cached_property
    def _loss_profile_fn(self):
        """Jitted masked eps-loss at a fixed vector of timesteps (one whole
        batch per t, scanned so the compile is a single forward)."""

        @jax.jit
        def profile(params, cells, grid: GridMap, rng: jax.Array, ts: jnp.ndarray):
            x = self._model_input(cells, grid)
            eps_fn = self._eps_fn(params, grid)
            B = x.shape[0]

            def one(carry, t_rng):
                t_scalar, r = t_rng
                t = jnp.full((B,), t_scalar, dtype=jnp.int32)
                loss = self.diffusion.p_losses(eps_fn, x, t, grid, r)
                return carry, loss

            rngs = jax.random.split(rng, ts.shape[0])
            _, losses = jax.lax.scan(one, 0, (ts, rngs))
            return losses

        return profile

    def eval_diagnostics(
        self, state, batch: Batch, rng: jax.Array
    ) -> Dict[str, float]:
        """Per-timestep eps-loss profile on one val batch.

        The mean train loss hides WHERE the eps-error lives: the monitored
        turbulence signal is ~5% of the prior scale in normalized space, so
        sampling quality hinges on the loss at specific noise levels.  Logs
        the masked eps-loss at 8 timesteps spread over [0, T) for both the
        train params and the EMA params used for sampling."""
        T = self.cfg.timesteps
        ts = jnp.asarray(
            np.unique(np.round(np.linspace(0, T - 1, 8)).astype(np.int32))
        )
        cells, grid = shard_batch_arrays(self.mesh, jnp.asarray(batch.cells), batch.grid)
        out: Dict[str, float] = {}
        losses = np.asarray(self._loss_profile_fn(state.params, cells, grid, rng, ts))
        for t, l in zip(np.asarray(ts), losses):
            out[f"val/eps-loss-t{int(t)}"] = float(l)
        if getattr(state, "ema_params", None) is not None:
            losses = np.asarray(
                self._loss_profile_fn(state.ema_params, cells, grid, rng, ts)
            )
            for t, l in zip(np.asarray(ts), losses):
                out[f"val/eps-loss-ema-t{int(t)}"] = float(l)
        return out

    @functools.cached_property
    def _sample_fn(self):
        @jax.jit
        def sample(params, cells: jnp.ndarray, grid: GridMap, rng: jax.Array):
            x_bcs = self._model_input(cells, grid)
            eps_fn = self._eps_fn(params, grid, self.eval_net)
            if self.cfg.sampler == "ddim":
                x = self.diffusion.ddim_sample_loop(
                    eps_fn,
                    x_bcs,
                    grid,
                    rng,
                    num_steps=self.cfg.ddim_steps,
                    eta=self.cfg.ddim_eta,
                )
            else:
                x = self.diffusion.p_sample_loop(eps_fn, x_bcs, grid, rng)
            x = self.normalizer.denormalize(x)
            return gather_cells(x, grid)

        return sample

    @functools.cached_property
    def _ddpm_chunk_fns(self):
        """Jitted (init, span, finalize) for host-chained ancestral sampling.

        The span program takes the chunk's timestep offset as a traced
        scalar and the chunk's rng keys as data, so ONE compilation serves
        every chunk position; chaining reproduces p_sample_loop bit-for-bit
        for the same rng (pinned by test)."""

        @jax.jit
        def init(cells: jnp.ndarray, grid: GridMap, rng: jax.Array):
            x_bcs = self._model_input(cells, grid)
            rng_init, rng_scan = jax.random.split(rng)
            x_t = self.diffusion.p_sample_init(x_bcs, grid, rng_init)
            rngs = jax.random.split(rng_scan, self.cfg.timesteps)
            return x_t, rngs

        @jax.jit
        def span(params, x_t, cells, grid, t_hi, rngs):
            x_bcs = self._model_input(cells, grid)
            eps_fn = self._eps_fn(params, grid, self.eval_net)
            return self.diffusion.p_sample_span(eps_fn, x_t, x_bcs, grid, t_hi, rngs)

        @jax.jit
        def finalize(x: jnp.ndarray, grid: GridMap):
            x = self.normalizer.denormalize(x)
            return gather_cells(x, grid)

        return init, span, finalize

    def _sample_ddpm_chunked(self, params, cells, grid: GridMap, rng: jax.Array):
        init, span, finalize = self._ddpm_chunk_fns
        T, C = self.cfg.timesteps, int(self.cfg.sampler_chunk)
        x_t, rngs = init(cells, grid, rng)
        k = 0
        for t_hi in range(T, 0, -C):
            n = min(C, t_hi)
            x_t = span(params, x_t, cells, grid, t_hi, rngs[k : k + n])
            k += n
        return finalize(x_t, grid)

    # ---- host-level API -------------------------------------------------------

    def training_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, float]]:
        cells, grid = shard_batch_arrays(self.mesh, jnp.asarray(batch.cells), batch.grid)
        state, metrics = self.train_step(state, cells, grid, rng)
        return state, metrics

    def sample(self, state, batch: Batch, rng: jax.Array) -> np.ndarray:
        """Generate denormalized samples as (B, n_cells, F) host array
        (sliced to the TRUE cell count when the batch is bucket-padded).

        Uses the EMA parameters when ema_decay is enabled."""
        cells, grid = shard_batch_arrays(self.mesh, jnp.asarray(batch.cells), batch.grid)
        params = self._sampling_params(state)
        chunked = (
            self.cfg.sampler != "ddim"
            and self.cfg.sampler_chunk
            and self.cfg.sampler_chunk < self.cfg.timesteps
        )
        if chunked:
            out = np.asarray(self._sample_ddpm_chunked(params, cells, grid, rng))
        else:
            out = np.asarray(self._sample_fn(params, cells, grid, rng))
        return out[:, : batch.metadata.n_cells]

    def eval_step(self, state: TrainState, batch: Batch, rng: jax.Array, phase: str):
        store = self.val_sample_store if phase == "val" else self.test_sample_store
        samples = self.sample(state, batch, rng)
        store.add_samples(samples, batch.metadata)
        # Cheap amplitude diagnostics: an undertrained eps-net blows samples up
        # orders of magnitude through the 500-step chain (see
        # docs/runs/overfit-4case/diagnosis.md) — u-std vs GT scale is the
        # earliest signal of that failure mode.
        u_dims = self.variables[0].dims if self.variables[0] is Variable.U else 3
        u = samples[..., :u_dims]
        return {
            f"{phase}/sample-u-std": float(np.std(u)),
            f"{phase}/sample-u-absmax": float(np.abs(u).max()),
        }

    def on_eval_start(self, phase: str):
        (self.val_sample_store if phase == "val" else self.test_sample_store).reset()

    def on_eval_end(self, stats: FieldStats, phase: str, *, expensive: bool):
        store = self.val_sample_store if phase == "val" else self.test_sample_store
        metrics = self.val_metrics if phase == "val" else self.test_metrics
        # The config flag gates the point-cloud Wasserstein even on the final
        # (expensive=True) validation — at shapes scale it is hours of exact
        # EMD on a small host; run it offline via eval_ckpt --expensive.
        expensive = expensive and self.cfg.compute_expensive_sample_metrics
        return metrics.compute(store, stats, expensive_metrics=expensive)

    def render_plots(self, out_dir, phase: str, step: int):
        """Render TKE-spectrum + slice diagnostics after an eval epoch."""
        from ..eval.plots import render_eval_plots

        store = self.val_sample_store if phase == "val" else self.test_sample_store
        collection = self.val_metrics if phase == "val" else self.test_metrics
        return render_eval_plots(
            out_dir, store, collection, self.variables, phase, step
        )
