import numpy as np
import pytest

import jax


def _task(synthetic_root, tmp_path, ema_decay):
    from generative_turbulence_tpu.data import DataModule, Variable
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.diffusion_task import DiffusionTask

    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=4",
            f"model.ema_decay={ema_decay}",
        ]
    ).resolved()
    dm = DataModule(
        synthetic_root,
        discard_first_seconds=-1.0,
        batch_size=4,
        eval_batch_size=4,
        val_samples=4,
        variables=(Variable.U, Variable.P),
    )
    dm.setup("fit")
    batch = next(iter(dm.val_batches()))
    task = DiffusionTask(cfg.model, dm.stats, synthetic_root, tmp_path)
    return task, batch


@pytest.mark.slow


def test_ema_tracks_params(synthetic_root, tmp_path):
    task, batch = _task(synthetic_root, tmp_path, ema_decay=0.5)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    assert state.ema_params is not None
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])

    state, _ = task.training_step(state, batch, jax.random.PRNGKey(1))
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    # Warmed-up EMA after one step (t=1): decay = min(0.5, (1+1)/(10+1))
    d = min(0.5, 2.0 / 11.0)
    np.testing.assert_allclose(e1, d * p0 + (1 - d) * p1, rtol=1e-5, atol=1e-7)
    # sampling uses the EMA params
    sp = task._sampling_params(state)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(sp)[0]), e1, rtol=1e-6
    )


@pytest.mark.slow


def test_ema_off_by_default(synthetic_root, tmp_path):
    task, batch = _task(synthetic_root, tmp_path, ema_decay=0.0)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    assert state.ema_params is None
    state, _ = task.training_step(state, batch, jax.random.PRNGKey(1))
    sp = task._sampling_params(state)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(sp)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


@pytest.mark.slow


def test_ema_with_accumulation_counts_real_updates(synthetic_root, tmp_path):
    """With optax.MultiSteps, EMA must be a no-op on non-emission micro-steps
    and the warm-up counter must count REAL parameter updates."""
    from generative_turbulence_tpu.data import DataModule, Variable
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.diffusion_task import DiffusionTask

    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=4",
            "model.ema_decay=0.5",
            "model.accumulate_steps=2",
        ]
    ).resolved()
    dm = DataModule(
        synthetic_root,
        discard_first_seconds=-1.0,
        batch_size=4,
        eval_batch_size=4,
        val_samples=4,
        variables=(Variable.U, Variable.P),
    )
    dm.setup("fit")
    batch = next(iter(dm.val_batches()))
    task = DiffusionTask(cfg.model, dm.stats, synthetic_root, tmp_path)

    state = task.init_state(jax.random.PRNGKey(0), batch)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    e0 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    np.testing.assert_array_equal(p0, e0)

    # micro-step 1: gradients accumulate, params unchanged, EMA unchanged
    state, _ = task.training_step(state, batch, jax.random.PRNGKey(1))
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    np.testing.assert_array_equal(p1, p0)
    np.testing.assert_array_equal(e1, e0)

    # micro-step 2: emission -> params change, EMA blends at t = 1 REAL update
    state, _ = task.training_step(state, batch, jax.random.PRNGKey(2))
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    e2 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    assert np.abs(p2 - p0).max() > 0
    d = min(0.5, 2.0 / 11.0)
    np.testing.assert_allclose(e2, d * p0 + (1 - d) * p2, rtol=1e-5, atol=1e-7)
