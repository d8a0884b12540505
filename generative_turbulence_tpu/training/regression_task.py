"""Autoregressive baseline tasks (TF-Net, DilResNet).

Re-designs ``turbdiff/models/regression.py:27-280`` + the per-model training
subclasses: the rollout is a ``lax.scan`` over forecast steps with
inside-mask freezing of boundary values; DilResNet trains on running-stat
normalized deltas whose statistics freeze after 1000 batches
(``turbdiff/models/dilresnet.py:153-213``) — expressed as explicit state in
the train step instead of torch buffers + F.batch_norm.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax.training.train_state import TrainState

from ..data.dataset import Batch
from ..data.grid import GridMap, embed_cells, gather_cells
from ..data.schema import FieldStats
from ..data.variables import Variable, channel_slices, total_dims
from ..eval.metrics import SampleMetricsCollection
from ..eval.sample_store import SampleStore
from ..models import Conditioning, DilResNet, Normalizer, TFNet
from ..parallel.mesh import shard_batch_arrays
from .config import ModelConfig
from .optimizers import build_optimizer


class RegressionState(TrainState):
    """TrainState + running delta statistics (used by DilResNet)."""

    dx_mean: jnp.ndarray = struct.field(pytree_node=True, default=None)
    dx_var: jnp.ndarray = struct.field(pytree_node=True, default=None)
    n_tracked: jnp.ndarray = struct.field(pytree_node=True, default=None)


class RegressionTaskBase:
    """Shared harness: unrolled prediction, eval protocol, sample stores."""

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
        self.cfg = cfg
        self.mesh = mesh
        self.variables = Variable.parse_tuple(cfg.variables)
        assert Variable.U in self.variables
        self.n_features = total_dims(self.variables)
        self.normalizer = Normalizer.from_stats(
            stats, self.variables, cfg.normalization_mode
        )
        self.monitor = cfg.monitor
        self.context_window = cfg.context_window
        self.unroll_steps = cfg.unroll_steps
        self.eval_unroll_steps = cfg.eval_unroll_steps
        self.sample_steps = tuple(cfg.sample_steps)
        if self.sample_steps:
            assert self.eval_unroll_steps >= max(self.sample_steps)

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.conditioning = None
        if cfg.cell_type_features or cfg.cell_pos_features:
            self.conditioning = Conditioning(
                cell_type_features=cfg.cell_type_features,
                cell_type_embedding=cfg.cell_type_embedding_type,
                cell_type_embedding_dim=cfg.cell_type_embedding_dim,
                cell_pos_features=cfg.cell_pos_features,
                dtype=dtype,
            )
        self.dtype = dtype
        self.net = self._build_net()
        self.tx = build_optimizer(
            optimizer=cfg.optimizer,
            learning_rate=cfg.learning_rate,
            min_learning_rate=cfg.min_learning_rate,
            lr_decay=cfg.lr_decay,
            max_train_steps=max_train_steps,
            gradient_clip_val=gradient_clip_val,
            accumulate_steps=cfg.accumulate_steps,
        )

        self.val_sample_stores = {
            s: SampleStore(Path(samples_root) / f"val-{s}-samples.h5", self.variables)
            for s in self.sample_steps
        }
        self.test_sample_stores = {
            s: SampleStore(Path(samples_root) / f"test-{s}-samples.h5", self.variables)
            for s in self.sample_steps
        }
        data_root = Path(data_root)
        self.val_metrics = {
            s: SampleMetricsCollection(
                f"val/{s}",
                data_root / "val",
                SampleMetricsCollection.default_metrics(wasserstein_solver),
            )
            for s in self.sample_steps
        }
        self.test_metrics = {
            s: SampleMetricsCollection(
                f"test/{s}",
                data_root / "test",
                SampleMetricsCollection.default_metrics(wasserstein_solver),
            )
            for s in self.sample_steps
        }

    def _build_net(self):
        raise NotImplementedError

    # ---- state ---------------------------------------------------------------

    def init_state(self, rng: jax.Array, batch: Batch) -> RegressionState:
        x = self._model_input(jnp.asarray(batch.cells[:1]), batch.grid)
        params = jax.jit(self._init_params)(rng, x, batch.grid)
        F = self.n_features
        return RegressionState.create(
            apply_fn=self.net.apply,
            params=params,
            tx=self.tx,
            dx_mean=jnp.zeros((F,)),
            dx_var=jnp.ones((F,)),
            n_tracked=jnp.zeros((), dtype=jnp.int32),
        )

    def n_params(self, state) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(state.params))

    def _model_input(self, cells: jnp.ndarray, grid: GridMap) -> jnp.ndarray:
        """(B, T, n_cells, F) -> normalized dense (B, T, X, Y, Z, F).

        Always float32: device-cached windows arrive as bfloat16 storage, but
        the rollout carry, loss math and delta statistics stay f32 (the net
        itself casts to its compute dtype internally)."""
        dense = embed_cells(cells, grid)
        return self.normalizer.normalize(dense).astype(jnp.float32)

    # ---- rollout ---------------------------------------------------------------

    def _forecast_one(self, params, state_extras, ctx: jnp.ndarray, grid: GridMap):
        """One-step prediction from context (B, W, X, Y, Z, F) -> (B, X, Y, Z, F)."""
        raise NotImplementedError

    def _predict_x(
        self, params, state_extras, x_context: jnp.ndarray, grid: GridMap, n_steps: int
    ) -> jnp.ndarray:
        """Unroll ``n_steps`` with boundary values frozen (inside-mask select)."""
        inside = grid.inside_mask[..., None]

        def step(ctx, _):
            pred = self._forecast_one(params, state_extras, ctx, grid)
            x_hat = jnp.where(inside, pred, ctx[:, -1])
            if ctx.shape[1] == 1:
                new_ctx = x_hat[:, None]
            else:
                new_ctx = jnp.concatenate([ctx[:, 1:], x_hat[:, None]], axis=1)
            return new_ctx, x_hat

        _, xs = jax.lax.scan(step, x_context, None, length=n_steps)
        return jnp.moveaxis(xs, 0, 1)  # (B, n_steps, X, Y, Z, F)

    # ---- train/eval steps --------------------------------------------------------

    @functools.cached_property
    def train_step(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: RegressionState, cells, grid: GridMap, rng: jax.Array):
            x = self._model_input(cells, grid)
            x_ctx, x_tgt = x[:, : self.context_window], x[:, self.context_window :]

            def loss_fn(params):
                x_hat = self._predict_x(
                    params, state, x_ctx, grid, x_tgt.shape[1]
                )
                return jnp.mean((x_hat - x_tgt) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            return state, {"train/loss": loss}

        return step

    @functools.cached_property
    def _eval_fn(self):
        @jax.jit
        def evaluate(state: RegressionState, cells, grid: GridMap):
            x = self._model_input(cells, grid)
            x_ctx, x_tgt = x[:, : self.context_window], x[:, self.context_window :]
            x_hat = self._predict_x(state.params, state, x_ctx, grid, x_tgt.shape[1])
            n = self.unroll_steps
            loss = jnp.mean((x_hat[:, :n] - x_tgt[:, :n]) ** 2)
            x_sample = self.normalizer.denormalize(x_hat)
            x_target = self.normalizer.denormalize(x_tgt)
            # Per-step per-variable unroll MSE at in-domain cells.
            s_cells = gather_cells(x_sample, grid)
            t_cells = gather_cells(x_target, grid)
            err2 = (s_cells - t_cells) ** 2  # (B, T, N, F)
            # Normalize by the TRUE cell count: bucket-padded rows are zeros
            # in both operands and must not dilute the MSE.
            n_valid = grid.n_valid.astype(err2.dtype)
            mse = {}
            for v, sl in channel_slices(self.variables).items():
                per_step = err2[..., sl].sum(axis=(-2, -1)) / n_valid  # (B, T)
                mse[v.key] = per_step.mean(axis=0)  # (T,)
            # Only the configured sample_steps leave the device: the full
            # rollout is (B, T, N, F) — ~150 MB per eval batch, 15 s on this
            # container's ~10 MB/s device link — while the stores keep one
            # frame per configured step.
            if self.sample_steps:
                sel = jnp.asarray(
                    [s - 1 for s in self.sample_steps], dtype=jnp.int32
                )
                s_out = s_cells[:, sel]  # (B, len(sample_steps), N, F)
            else:
                s_out = s_cells[:, :0]
            return loss, s_out, mse

        return evaluate

    def training_step(self, state, batch: Batch, rng: jax.Array):
        cells, grid = shard_batch_arrays(self.mesh, jnp.asarray(batch.cells), batch.grid)
        return self.train_step(state, cells, grid, rng)

    def eval_step(self, state, batch: Batch, rng: jax.Array, phase: str):
        cells, grid = shard_batch_arrays(self.mesh, jnp.asarray(batch.cells), batch.grid)
        loss, sample_cells, mse = self._eval_fn(state, cells, grid)
        stores = self.val_sample_stores if phase == "val" else self.test_sample_stores
        sample_cells = np.asarray(sample_cells)
        for j, (s, store) in enumerate(stores.items()):
            store.add_samples(sample_cells[:, j], batch.metadata)
        out = {f"{phase}/loss": float(loss)}
        for key, per_step in mse.items():
            per_step = np.asarray(per_step)
            for i in range(per_step.shape[0]):
                out[f"{phase}/unroll/mse-{key}-{i + 1}"] = float(per_step[i])
        return out

    def on_eval_start(self, phase: str):
        stores = self.val_sample_stores if phase == "val" else self.test_sample_stores
        for store in stores.values():
            store.reset()

    def on_eval_end(self, stats: FieldStats, phase: str, *, expensive: bool):
        stores = self.val_sample_stores if phase == "val" else self.test_sample_stores
        collections = self.val_metrics if phase == "val" else self.test_metrics
        expensive = expensive and self.cfg.compute_expensive_sample_metrics
        metrics: Dict[str, float] = {}
        for s, collection in collections.items():
            step_metrics = collection.compute(
                stores[s], stats, expensive_metrics=expensive
            )
            metrics.update(step_metrics)
            if s == self.cfg.main_sample_step:
                # Promote main-step metrics to global names (val/<x> from val/<s>/<x>).
                for key, value in step_metrics.items():
                    parts = key.split("/")
                    metrics["/".join([parts[0], *parts[2:]])] = value
        return metrics

    def unroll_samples(self, state, batch: Batch, sample_steps, block_size: int):
        """Block-wise long rollout (memory-bounded), denormalized cell values."""
        assert block_size >= self.context_window
        cells, grid = shard_batch_arrays(self.mesh, jnp.asarray(batch.cells), batch.grid)
        x_ctx = self._model_input(cells, grid)[:, : self.context_window]
        outputs = []
        for i in range(0, max(sample_steps) + 1, block_size):
            x_hat = self._predict_x(state.params, state, x_ctx, grid, block_size)
            x_ctx = x_hat[:, -self.context_window :]
            idxs = [j - i for j in sample_steps if i <= j < i + block_size]
            if idxs:
                outputs.append(np.asarray(gather_cells(
                    self.normalizer.denormalize(x_hat[:, idxs]), grid
                )))
        return np.concatenate(outputs, axis=1)


class TFNetTask(RegressionTaskBase):
    def _build_net(self):
        return TFNet(
            n_features=self.n_features,
            context_window=self.cfg.context_window,
            temporal_filtering_length=self.cfg.temporal_filtering_length,
            kernel_size=self.cfg.kernel_size,
            dropout_rate=self.cfg.dropout_rate,
            conditioning=self.conditioning,
            dtype=self.dtype,
        )

    def _init_params(self, rng, x, grid: GridMap):
        return self.net.init(rng, x[:, : self.context_window], grid.cell_types)

    def _forecast_one(self, params, state_extras, ctx, grid: GridMap):
        return self.net.apply(params, ctx, grid.cell_types)


class DilResNetTask(RegressionTaskBase):
    """Delta prediction with running statistics frozen after 1000 batches."""

    N_TRACK_BATCHES = 1000
    BN_MOMENTUM = 0.1

    def _build_net(self):
        return DilResNet(
            n_features=self.n_features,
            N=self.cfg.N,
            hidden_dim=self.cfg.hidden_dim,
            conditioning=self.conditioning,
            dtype=self.dtype,
        )

    def _init_params(self, rng, x, grid: GridMap):
        assert self.unroll_steps == 1, "DilResNet training uses unroll_steps=1"
        return self.net.init(rng, x[:, -1], grid.cell_types)

    def _forecast_one(self, params, state, ctx, grid: GridMap):
        x_last = ctx[:, -1]
        dx_normed = self.net.apply(params, x_last, grid.cell_types)
        dx = state.dx_mean + jnp.sqrt(state.dx_var) * dx_normed
        return x_last + dx

    @functools.cached_property
    def train_step(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: RegressionState, cells, grid: GridMap, rng: jax.Array):
            x = self._model_input(cells, grid)
            x0 = x[:, self.context_window - 1]
            if self.cfg.training_noise_std is not None:
                x0 = x0 + self.cfg.training_noise_std * jax.random.normal(
                    rng, x0.shape, dtype=x0.dtype
                )
            x1 = x[:, self.context_window]
            dx = x1 - x0

            # Per-channel delta statistics over in-domain cells; bucket
            # padding rows are zeros, so sums are exact and the counts use
            # the traced TRUE cell count.
            dx_cells = gather_cells(dx, grid)  # (B, N, F)
            n = dx_cells.shape[0] * grid.n_valid.astype(dx_cells.dtype)
            batch_mean = dx_cells.sum(axis=(0, 1)) / n
            batch_var = (dx_cells**2).sum(axis=(0, 1)) / n - batch_mean**2

            tracking = state.n_tracked < self.N_TRACK_BATCHES
            m = self.BN_MOMENTUM
            new_mean = jnp.where(
                tracking, (1 - m) * state.dx_mean + m * batch_mean, state.dx_mean
            )
            # torch running_var uses the unbiased batch variance
            unbiased = batch_var * n / jnp.maximum(n - 1, 1)
            new_var = jnp.where(
                tracking, (1 - m) * state.dx_var + m * unbiased, state.dx_var
            )

            # batch_norm semantics: normalize by batch stats while tracking,
            # by running stats afterwards.
            norm_mean = jnp.where(tracking, batch_mean, state.dx_mean)
            norm_var = jnp.where(tracking, batch_var, state.dx_var)
            dx_target = (dx_cells - norm_mean) / jnp.sqrt(norm_var + 1e-5)

            def loss_fn(params):
                dx_hat = self.net.apply(params, x0, grid.cell_types)
                dx_hat_cells = gather_cells(dx_hat, grid)
                return jnp.mean((dx_hat_cells - dx_target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            state = state.replace(
                dx_mean=new_mean, dx_var=new_var, n_tracked=state.n_tracked + 1
            )
            return state, {"train/loss": loss}

        return step
