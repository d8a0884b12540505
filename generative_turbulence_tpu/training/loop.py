"""The training loop: epochs, periodic validation, checkpointing, time limit.

Replaces the pytorch-lightning Trainer wiring of the reference
(``train.py:131-212``): explicit RNG threading (seed -> fold_in per step),
check_val_every_n_epoch semantics, a wall-clock train limit that forces a
final validation before stopping (``turbdiff/time_limit.py:29-42``), last +
best-on-monitor checkpoints, JSONL/wandb metric logging, and optional test
evaluation on the best checkpoint.
"""

from __future__ import annotations

import re
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from .checkpoint import CheckpointManager
from .config import Config
from .logging import MetricLogger


def _mean_over_batches(outputs) -> Dict[str, float]:
    """Average per-batch eval-step metric dicts key-wise."""
    merged: Dict[str, list] = {}
    for out in outputs:
        for k, v in out.items():
            merged.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in merged.items()}


def eval_rng_for(base: jax.Array, case_name: str, batch_in_case: int) -> jax.Array:
    """Per-eval-batch RNG keyed on the CASE identity, not enumeration order.

    Folding in a stable case hash (instead of the loop index) makes the draw
    invariant to how cases are sharded over hosts — a distributed validate
    produces bit-identical samples to the single-process one, which is what
    ``tests/test_distributed.py`` asserts end-to-end.
    """
    import zlib

    key = zlib.crc32(case_name.encode("utf-8")) & 0x7FFFFFFF
    return jax.random.fold_in(jax.random.fold_in(base, key), batch_in_case)


def parse_duration(spec: Optional[str]) -> Optional[float]:
    """'24h' / '30m' / '90s' / '1d' -> seconds."""
    if spec is None:
        return None
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([dhms])", spec.strip())
    if not m:
        raise ValueError(f"Bad duration {spec!r}; use e.g. 24h, 30m, 90s")
    value, unit = float(m.group(1)), m.group(2)
    return value * {"d": 86400, "h": 3600, "m": 60, "s": 1}[unit]


class Trainer:
    def __init__(
        self, config: Config, task, datamodule, *, use_wandb: Optional[bool] = None
    ):
        self.config = config.resolved()
        self.task = task
        self.dm = datamodule
        tc = self.config.trainer
        self.out_dir = Path(tc.out_dir)
        if use_wandb is None:
            use_wandb = tc.use_wandb
        self.logger = MetricLogger(
            self.out_dir,
            use_wandb=use_wandb,
            wandb_kwargs={
                "project": tc.wandb_project,
                "name": tc.wandb_run_name,
                "config": self.config.to_dict(),
            },
        )
        self.ckpt = CheckpointManager(self.out_dir / "checkpoints", self.config.to_json())
        self.time_limit = parse_duration(tc.train_limit)
        self.monitor = task.monitor
        self._vals_since_best = 0

    def fit(self, state=None) -> Dict[str, float]:
        tc = self.config.trainer
        rng = jax.random.PRNGKey(tc.seed)
        self.dm.setup("fit")

        if state is None:
            init_rng, rng = jax.random.split(rng)
            example = next(iter(self.dm.val_batches()))
            state = self.task.init_state(init_rng, example)
            self.logger.console(
                f"initialized model with {self.task.n_params(state):,} parameters"
            )
            if tc.resume_from:
                import numpy as np_

                template = jax.tree_util.tree_map(np_.asarray, state)
                state = CheckpointManager(Path(tc.resume_from)).restore(
                    template, "last"
                )
                self.logger.console(
                    f"resumed from {tc.resume_from} at step {int(state.step)}"
                )

        start = time.time()
        stop = False
        last_val_metrics: Dict[str, float] = {}
        step = int(state.step)
        profiling = False
        step_tic = time.perf_counter()

        # Epochs are GLOBAL: a resumed run starts at the epoch implied by the
        # restored step counter, so it replays the same per-epoch shuffle
        # order and validation cadence an unkilled run would have had, and
        # max_epochs bounds the TOTAL training length across restarts (the
        # reference's Lightning resume semantics, train.py:174-198).
        n_batches = max(1, self.dm.n_train_batches())
        start_epoch = step // n_batches

        for epoch in range(start_epoch, tc.max_epochs):
            if stop:
                break
            epoch_losses = []
            for batch in self.dm.train_batches(epoch):
                if tc.profile_steps > 0 and step == tc.profile_start and not profiling:
                    jax.profiler.start_trace(str(self.out_dir / "profile"))
                    profiling = True
                step_rng = jax.random.fold_in(rng, step)
                state, metrics = self.task.training_step(state, batch, step_rng)
                step += 1
                if profiling and step >= tc.profile_start + tc.profile_steps:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.console(f"profiler trace in {self.out_dir / 'profile'}")
                # No per-step host sync: fetching the loss every step forces a
                # device->host round-trip (~28 ms dispatch on this backend)
                # that serializes dispatch.  Values leave the device only at
                # the log boundary; the epoch mean uses that logged subset.
                if step % tc.log_every_n_steps == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    epoch_losses.append(metrics["train/loss"])
                    now = time.perf_counter()
                    metrics["steps_per_sec"] = tc.log_every_n_steps / (now - step_tic)
                    step_tic = now
                    self.logger.log(metrics, step=step, epoch=epoch)
                if self.time_limit is not None and time.time() - start > self.time_limit:
                    self.logger.console("train limit reached; running final validation")
                    stop = True
                    break
                if tc.max_steps is not None and step >= tc.max_steps:
                    self.logger.console(f"max_steps={tc.max_steps} reached")
                    stop = True
                    break

            if epoch_losses:
                self._last_epoch_loss = float(np.mean(epoch_losses))
                loss_str = f"{self._last_epoch_loss:.5f}"
            elif getattr(self, "_last_epoch_loss", None) is not None:
                # No step hit the log boundary this epoch (short epochs vs
                # log_every_n_steps); show the last fetched value instead of
                # a misleading nan.
                loss_str = f"~{self._last_epoch_loss:.5f}"
            else:
                loss_str = "(pending first log step)"
            self.logger.console(f"epoch {epoch}: train/loss={loss_str} ({step} steps)")

            final_epoch = stop or epoch == tc.max_epochs - 1
            if final_epoch or (epoch + 1) % tc.check_val_every_n_epoch == 0:
                val_metrics = self.validate(state, rng, expensive=final_epoch, epoch=epoch)
                last_val_metrics = val_metrics
                if self.monitor in val_metrics:
                    is_best = self.ckpt.save_best(
                        state, step, val_metrics[self.monitor]
                    )
                    self.logger.update_best(self.monitor, val_metrics, step)
                    if is_best:
                        self._vals_since_best = 0
                    else:
                        self._vals_since_best += 1
                        patience = tc.early_stopping_patience
                        if patience is not None and self._vals_since_best >= patience:
                            self.logger.console(
                                f"early stopping: {self.monitor} stale for "
                                f"{patience} validations"
                            )
                            stop = True

            if (epoch + 1) % tc.checkpoint_every_n_epochs == 0 or final_epoch:
                self.ckpt.save_last(state, step)

        if tc.eval_testset:
            test_metrics = self.test(state, rng)
            last_val_metrics.update(test_metrics)

        self.state = state
        return last_val_metrics

    def validate(
        self, state, rng: jax.Array, *, expensive: bool = False, epoch: int = 0
    ) -> Dict[str, float]:
        self.dm.setup("validate")
        self.task.on_eval_start("val")
        step_outputs = []
        # Fold the epoch in so successive validations draw fresh noise: with a
        # fixed eval RNG, epoch-over-epoch monitor deltas (the early-stopping
        # signal) would be correlated in a way the reference protocol is not.
        # deterministic_eval restores the fixed-noise behavior for A/B evals.
        base = rng if self.config.trainer.deterministic_eval else jax.random.fold_in(
            rng, 10_000 + epoch
        )
        batch_in_case: Dict[str, int] = {}
        diagnostics: Dict[str, float] = {}
        # Diagnostics run on ONE canonical batch — the first batch of the
        # globally-first val case (unsharded ordering) — so that under
        # shard_eval every rank ends with the SAME values (cluster-consistent
        # early stopping) and they equal the single-process run bit-exactly.
        # Exactly one rank owns that case; the others receive the dict via
        # the allgather merge below.
        has_diag = hasattr(self.task, "eval_diagnostics")
        first_case = self.dm.first_val_case() if has_diag else None
        for batch in self.dm.val_batches():
            case = batch.metadata.case_name
            k = batch_in_case.get(case, 0)
            batch_in_case[case] = k + 1
            if has_diag and not diagnostics and case == first_case and k == 0:
                diagnostics = self.task.eval_diagnostics(
                    state, batch, jax.random.fold_in(base, 777)
                )
            out = self.task.eval_step(
                state, batch, eval_rng_for(base, case, k), "val"
            )
            if out:
                step_outputs.append(out)
        if has_diag and self.dm.shard_eval and jax.process_count() > 1:
            from ..parallel.distributed import allgather_objects

            # Collective: every rank calls this exactly once per validation,
            # with an empty dict on non-owning ranks.
            for d in allgather_objects(diagnostics):
                if d:
                    diagnostics = d
                    break
        metrics = self.task.on_eval_end(self.dm.stats, "val", expensive=expensive)
        metrics.update(diagnostics)
        metrics.update(_mean_over_batches(step_outputs))
        self.logger.log(metrics, step=int(state.step), epoch=epoch)
        if self.config.trainer.render_plots and hasattr(self.task, "render_plots"):
            try:
                self.task.render_plots(self.out_dir, "val", int(state.step))
            except Exception as e:  # plots must never kill a run
                self.logger.console(f"plot rendering failed: {e}")
        summary = {
            k: v for k, v in metrics.items() if k.count("/") == 1
        }
        self.logger.console(f"validation: {summary}")
        return metrics

    def test(self, state, rng: jax.Array) -> Dict[str, float]:
        self.dm.setup("test")
        self.task.on_eval_start("test")
        step_outputs = []
        base = jax.random.fold_in(rng, 2_000_000)
        batch_in_case: Dict[str, int] = {}
        for batch in self.dm.test_batches():
            case = batch.metadata.case_name
            k = batch_in_case.get(case, 0)
            batch_in_case[case] = k + 1
            out = self.task.eval_step(
                state, batch, eval_rng_for(base, case, k), "test"
            )
            if out:
                step_outputs.append(out)
        metrics = self.task.on_eval_end(self.dm.stats, "test", expensive=True)
        metrics.update(_mean_over_batches(step_outputs))
        self.logger.log(metrics, step=int(state.step))
        return metrics
