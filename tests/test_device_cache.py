"""Device-resident training-frame cache (data.DeviceFrameCache).

The reference streams every batch host->device through DataLoader workers
(``turbdiff/data/ofles.py:483-548``); on a remote-attached accelerator whose
link sustains ~10 MB/s, that caps training far below the device step time.
These tests pin that the resident path is a drop-in replacement: same frames,
same values (to the bfloat16 cast), and a clean streaming fallback when the
capacity is exhausted.

Batches are snapshotted at collection time: pooled buffers are recycled and
CPU device_put is zero-copy, so retaining live Batch objects across the
iteration (which the production loops never do) would alias reused memory.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from generative_turbulence_tpu.data import DataModule


@dataclasses.dataclass
class Snap:
    cells: np.ndarray  # float32 copy
    dtype: object
    on_device: bool
    file: str
    t: tuple


def _collect(dm_kwargs, synthetic_root, n=None):
    dm = DataModule(
        synthetic_root,
        batch_size=3,
        eval_batch_size=2,
        val_samples=2,
        cell_bucket=512,
        seed=7,
        **dm_kwargs,
    )
    dm.setup("fit")
    out = []
    for b in dm.train_batches():
        out.append(
            Snap(
                cells=np.array(b.cells, copy=True).astype(np.float32),
                dtype=b.cells.dtype,
                on_device=isinstance(b.cells, jax.Array),
                file=str(b.metadata.file),
                t=tuple(np.asarray(b.t).tolist()),
            )
        )
        if n is not None and len(out) >= n:
            break
    return dm, out


def _key(s: Snap):
    return (s.file, s.t)


def test_device_cache_matches_streaming(synthetic_root):
    _, streamed = _collect({}, synthetic_root)
    dm, cached = _collect({"device_cache_gb": 1.0}, synthetic_root)

    assert dm.device_cache is not None and dm.device_cache.used > 0
    assert not dm.device_cache.full
    by_key = {_key(s): s for s in streamed}
    assert len(cached) == len(streamed)
    for s in cached:
        ref = by_key[_key(s)]
        assert s.on_device and s.dtype == jnp.bfloat16
        # resident frames are stored in bfloat16: ~3 significant digits
        np.testing.assert_allclose(s.cells, ref.cells, rtol=1.6e-2, atol=1e-6)
        assert s.cells.shape == ref.cells.shape


def test_device_cache_second_epoch_hits(synthetic_root):
    dm, first = _collect({"device_cache_gb": 1.0}, synthetic_root)
    used = dm.device_cache.used
    second = [
        isinstance(b.cells, jax.Array) for b in dm.train_batches()
    ]
    assert dm.device_cache.used == used  # no re-uploads
    assert len(second) == len(first)
    assert all(second)


def test_device_cache_capacity_falls_back_to_streaming(synthetic_root):
    # Far too small for even one case: every batch must stream (and streamed
    # batches still reach the device as bf16 via the cast transform).
    dm, cached = _collect({"device_cache_gb": 1e-6}, synthetic_root)
    assert dm.device_cache.full
    assert dm.device_cache.used == 0
    assert all(s.dtype == jnp.bfloat16 for s in cached)
    _, streamed = _collect({}, synthetic_root)
    assert len(cached) == len(streamed)
    by_key = {_key(s): s for s in streamed}
    for s in cached:
        np.testing.assert_allclose(
            s.cells, by_key[_key(s)].cells, rtol=1.6e-2, atol=1e-6
        )


def test_transfer_dtype_bf16_streaming(synthetic_root):
    _, streamed = _collect({}, synthetic_root, n=2)
    _, cast = _collect({"transfer_dtype": "bfloat16"}, synthetic_root, n=2)
    by_key = {_key(s): s for s in streamed}
    for s in cast:
        assert s.on_device and s.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            s.cells, by_key[_key(s)].cells, rtol=1.6e-2, atol=1e-6
        )


def test_training_step_accepts_resident_bf16_batches(synthetic_root, tmp_path):
    """The jitted train step must trace/execute with bfloat16 device-resident
    cells (the long-run configuration on the slow-link TPU host)."""
    import jax
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            f"data.root={synthetic_root}",
            "data.discard_first_seconds=-1",
            "data.val_samples=2",
            "data.eval_batch_size=2",
            "data.device_cache_gb=0.5",
            "model.batch_size=3",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=5",
            f"trainer.out_dir={tmp_path}/run",
        ]
    ).resolved()
    dm, task = instantiate_data_and_task(cfg)
    batches = dm.train_batches()
    first = next(batches)
    assert isinstance(first.cells, jax.Array) and first.cells.dtype == jnp.bfloat16
    state = task.init_state(jax.random.PRNGKey(0), first)
    losses = []
    for i, b in enumerate([first, next(batches)]):
        state, metrics = task.training_step(state, b, jax.random.PRNGKey(i))
        losses.append(float(metrics["train/loss"]))
    assert all(np.isfinite(l) for l in losses)


def _collect_seq(dm_kwargs, synthetic_root, phase="train"):
    from generative_turbulence_tpu.data.sequence import SequenceDataModule

    dm = SequenceDataModule(
        synthetic_root,
        batch_size=2,
        seq_len=3,
        eval_batch_size=2,
        eval_seq_len=4,
        val_samples=2,
        cell_bucket=512,
        seed=7,
        **dm_kwargs,
    )
    dm.setup("fit")
    out = []
    batches = dm.train_batches() if phase == "train" else dm.val_batches()
    for b in batches:
        out.append(
            Snap(
                cells=np.array(b.cells, copy=True).astype(np.float32),
                dtype=b.cells.dtype,
                on_device=isinstance(b.cells, jax.Array),
                file=str(b.metadata.file),
                t=tuple(np.asarray(b.t).reshape(-1).tolist()),
            )
        )
    return dm, out


def test_sequence_device_cache_matches_streaming(synthetic_root):
    _, streamed = _collect_seq({}, synthetic_root)
    dm, cached = _collect_seq({"device_cache_gb": 1.0}, synthetic_root)

    assert dm.train_cache is not None and dm.train_cache.used > 0
    assert not dm.train_cache.full
    by_key = {_key(s): s for s in streamed}
    assert len(cached) == len(streamed)
    for s in cached:
        ref = by_key[_key(s)]
        assert s.on_device and s.dtype == jnp.bfloat16
        assert s.cells.ndim == 4  # (B, T, nb, F)
        assert s.cells.shape == ref.cells.shape
        np.testing.assert_allclose(s.cells, ref.cells, rtol=1.6e-2, atol=1e-6)


def test_sequence_eval_cache_matches_streaming(synthetic_root):
    _, streamed = _collect_seq({}, synthetic_root, phase="val")
    dm, cached = _collect_seq(
        {"eval_device_cache_gb": 1.0}, synthetic_root, phase="val"
    )
    assert dm.val_cache is not None and dm.val_cache.used > 0
    by_key = {_key(s): s for s in streamed}
    assert len(cached) == len(streamed)
    for s in cached:
        ref = by_key[_key(s)]
        # Eval caches stay float32: rollout context and loss targets must be
        # BIT-identical to the streaming path so metrics don't shift when the
        # cache is toggled (only TRAIN caches quantize to bfloat16).
        assert s.on_device and s.dtype == jnp.float32
        assert s.cells.shape == ref.cells.shape
        np.testing.assert_array_equal(np.asarray(s.cells), np.asarray(ref.cells))


def test_tfnet_training_step_accepts_resident_windows(synthetic_root, tmp_path):
    import jax
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = parse_cli_overrides(
        [
            "model=tfnet",
            f"data.root={synthetic_root}",
            "data.discard_first_seconds=-1",
            "data.val_samples=2",
            "data.eval_batch_size=2",
            "data.device_cache_gb=0.5",
            "model.batch_size=2",
            "model.context_window=4",
            "model.unroll_steps=1",
            "model.eval_unroll_steps=2",
            "model.temporal_filtering_length=2",
            "model.cell_type_embedding_dim=4",
            f"trainer.out_dir={tmp_path}/run",
        ]
    ).resolved()
    dm, task = instantiate_data_and_task(cfg)
    batches = dm.train_batches()
    first = next(batches)
    assert isinstance(first.cells, jax.Array) and first.cells.dtype == jnp.bfloat16
    state = task.init_state(jax.random.PRNGKey(0), first)
    state, metrics = task.training_step(state, first, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/loss"]))


def test_eval_batches_stay_float32(synthetic_root):
    dm = DataModule(
        synthetic_root,
        batch_size=3,
        eval_batch_size=2,
        val_samples=2,
        cell_bucket=512,
        device_cache_gb=1.0,
    )
    dm.setup("fit")
    for b in dm.val_batches():
        assert np.asarray(b.cells).dtype == np.float32
