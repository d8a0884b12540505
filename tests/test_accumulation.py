import numpy as np
import pytest

import jax


def test_gradient_accumulation_equivalence(synthetic_root, tmp_path):
    """k micro-steps with MultiSteps(k) must equal one full-batch update when
    micro-batch gradients average to the full-batch gradient (same data)."""
    import jax.numpy as jnp
    import optax

    from generative_turbulence_tpu.training.optimizers import build_optimizer

    def quad_grad(params, x):
        return jax.grad(lambda p: jnp.mean((p * x - 1.0) ** 2))(params)

    params0 = jnp.asarray(2.0)
    x_full = jnp.asarray([1.0, 2.0, 3.0, 4.0])

    tx_full = build_optimizer(
        optimizer="adam", learning_rate=1e-2, lr_decay=None, gradient_clip_val=None
    )
    s_full = tx_full.init(params0)
    g_full = quad_grad(params0, x_full)
    u_full, _ = tx_full.update(g_full, s_full, params0)
    p_full = optax.apply_updates(params0, u_full)

    tx_acc = build_optimizer(
        optimizer="adam",
        learning_rate=1e-2,
        lr_decay=None,
        gradient_clip_val=None,
        accumulate_steps=2,
    )
    s = tx_acc.init(params0)
    p = params0
    for chunk in (x_full[:2], x_full[2:]):
        g = quad_grad(p, chunk)
        u, s = tx_acc.update(g, s, p)
        p = optax.apply_updates(p, u)

    assert float(p) == pytest.approx(float(p_full), rel=1e-6)


def test_factory_with_accumulation(synthetic_root, tmp_path):
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            f"data.root={synthetic_root}",
            "data.discard_first_seconds=-1",
            "model.batch_size=4",
            "model.accumulate_steps=2",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=4",
            f"trainer.out_dir={tmp_path}/acc",
        ]
    ).resolved()
    dm, task = instantiate_data_and_task(cfg)
    # micro-batches of size 2 feed the task
    batch = next(iter(dm.train_batches()))
    assert batch.cells.shape[0] <= 2

    state = task.init_state(jax.random.PRNGKey(0), batch)
    p0 = [np.asarray(p).copy() for p in jax.tree_util.tree_leaves(state.params)]
    # first micro-step must NOT change params (accumulating): exact equality
    state, _ = task.training_step(state, batch, jax.random.PRNGKey(1))
    p1 = [np.asarray(p) for p in jax.tree_util.tree_leaves(state.params)]
    assert all(np.array_equal(a, b) for a, b in zip(p0, p1))
    # second micro-step applies the update: some leaf must move
    batch2 = next(iter(dm.train_batches()))
    state, _ = task.training_step(state, batch2, jax.random.PRNGKey(2))
    p2 = [np.asarray(p) for p in jax.tree_util.tree_leaves(state.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(p0, p2))
