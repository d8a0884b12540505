"""Build datamodule + task from a resolved Config (the reference's
``turbdiff/config.py:17-165`` factory equivalent)."""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

from ..data.dataset import DataModule
from ..data.sequence import SequenceDataModule
from ..data.variables import Variable
from ..parallel.mesh import create_mesh
from .config import Config
from .diffusion_task import DiffusionTask
from .regression_task import DilResNetTask, TFNetTask


def instantiate_data_and_task(config: Config) -> Tuple[object, object]:
    config = config.resolved()
    mc, dc, tc = config.model, config.data, config.trainer
    variables = Variable.parse_tuple(mc.variables)
    root = Path(dc.root)
    mesh = create_mesh(tc.mesh_shape)

    # Gradient accumulation: feed micro-batches of batch/k; the optimizer
    # updates every k micro-batches, keeping the effective batch unchanged.
    k = max(1, mc.accumulate_steps)
    micro_batch = max(1, dc.batch_size // k)

    if mc.name == "diffusion":
        dm = DataModule(
            root,
            discard_first_seconds=dc.discard_first_seconds,
            batch_size=micro_batch,
            eval_batch_size=dc.eval_batch_size,
            val_samples=dc.val_samples,
            test_samples=dc.test_samples,
            variables=variables,
            prefetch_size=dc.prefetch_size,
            seed=tc.seed,
            shard_by_host=dc.shard_by_host,
            shard_eval=dc.shard_eval,
            device_prefetch=dc.device_prefetch,
            cell_bucket=dc.cell_bucket,
            buffer_pool=dc.buffer_pool,
            device_cache_gb=dc.device_cache_gb,
            transfer_dtype=dc.transfer_dtype,
        )
        dm.setup("fit")
        # LR schedule length = epochs * optimizer updates/epoch
        # (reference config.py:72-73); with accumulation, updates = batches/k.
        max_train_steps = max(
            1, (tc.max_epochs or mc.max_epochs) * dm.n_train_batches() // k
        )
        task = DiffusionTask(
            mc,
            dm.stats,
            data_root=root,
            samples_root=Path(tc.samples_root),
            max_train_steps=max_train_steps,
            gradient_clip_val=tc.gradient_clip_val,
            mesh=mesh,
            wasserstein_solver=tc.wasserstein_solver,
        )
        return dm, task

    if mc.name in ("tfnet", "dilresnet"):
        seq_len = mc.context_window + mc.unroll_steps
        eval_seq_len = mc.context_window + mc.eval_unroll_steps
        dm = SequenceDataModule(
            root,
            discard_first_seconds=dc.discard_first_seconds,
            batch_size=micro_batch,
            seq_len=seq_len,
            eval_batch_size=dc.eval_batch_size,
            eval_seq_len=eval_seq_len,
            val_samples=dc.val_samples,
            test_samples=dc.test_samples,
            variables=variables,
            stride=dc.stride,
            prefetch_size=dc.prefetch_size,
            cell_bucket=dc.cell_bucket,
            seed=tc.seed,
            device_cache_gb=dc.device_cache_gb,
            eval_device_cache_gb=dc.eval_device_cache_gb,
        )
        dm.setup("fit")
        max_train_steps = max(
            1, (tc.max_epochs or mc.max_epochs) * dm.n_train_batches() // k
        )
        task_cls = TFNetTask if mc.name == "tfnet" else DilResNetTask
        task = task_cls(
            mc,
            dm.stats,
            data_root=root,
            samples_root=Path(tc.samples_root),
            max_train_steps=max_train_steps,
            gradient_clip_val=tc.gradient_clip_val,
            mesh=mesh,
            wasserstein_solver=tc.wasserstein_solver,
        )
        return dm, task

    raise ValueError(f"Unknown model {mc.name!r}")
