import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from generative_turbulence_tpu.parallel import create_mesh, shard_batch_arrays
from generative_turbulence_tpu.parallel.mesh import constrain_dense, replicate


def test_create_mesh_shapes():
    mesh = create_mesh((4, 2))
    assert mesh.shape == {"dp": 4, "sp": 2}
    assert create_mesh(None) is None


@pytest.mark.slow


def test_dryrun_entrypoints():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 4
    g.dryrun_multichip(8)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
@pytest.mark.slow
def test_data_parallel_training_matches_single_device(
    synthetic_root, tmp_path, mesh_shape
):
    """A (dp, sp)-sharded train step must produce the same loss/params
    trajectory as the unsharded one (same rng, same data) — including deeper
    spatial sharding (sp=4: three halo exchanges per conv axis)."""
    from generative_turbulence_tpu.data import DataModule, Variable
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.diffusion_task import DiffusionTask

    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=5",
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

    rng = jax.random.PRNGKey(0)

    task_single = DiffusionTask(
        cfg.model, dm.stats, synthetic_root, tmp_path / "s1", mesh=None
    )
    state1 = task_single.init_state(rng, batch)
    state1, m1 = task_single.training_step(state1, batch, jax.random.PRNGKey(7))

    mesh = create_mesh(mesh_shape)
    task_sharded = DiffusionTask(
        cfg.model, dm.stats, synthetic_root, tmp_path / "s2", mesh=mesh
    )
    state2 = task_sharded.init_state(rng, batch)
    state2 = jax.device_put(state2, NamedSharding(mesh, P()))
    state2, m2 = task_sharded.training_step(state2, batch, jax.random.PRNGKey(7))

    assert float(m1["train/loss"]) == pytest.approx(
        float(m2["train/loss"]), rel=2e-4
    )
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=2e-6)


@pytest.mark.slow


def test_sharded_sampling_runs(synthetic_root, tmp_path):
    from generative_turbulence_tpu.data import DataModule, Variable
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.diffusion_task import DiffusionTask

    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=4",
            "model.sampler=ddim",
            "model.ddim_steps=2",
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

    mesh = create_mesh((2, 2))
    task = DiffusionTask(
        cfg.model, dm.stats, synthetic_root, tmp_path / "s", mesh=mesh
    )
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    samples = task.sample(state, batch, jax.random.PRNGKey(1))
    assert samples.shape == (4, batch.grid.n_cells, 4)
    assert np.all(np.isfinite(samples))


def test_constrain_dense_preserves_values():
    mesh = create_mesh((2, 2))
    x = jnp.arange(2 * 8 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 8, 4, 4, 3)

    @jax.jit
    def f(x):
        return constrain_dense(mesh, x) * 2

    y = f(jax.device_put(x, NamedSharding(mesh, P("dp"))))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2)

    tree = replicate(mesh, {"a": x})
    np.testing.assert_allclose(np.asarray(tree["a"]), np.asarray(x))
