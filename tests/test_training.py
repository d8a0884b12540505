import json
from pathlib import Path

import numpy as np
import pytest

from generative_turbulence_tpu.training import Config, parse_cli_overrides
from generative_turbulence_tpu.training.loop import parse_duration


def test_config_presets_and_overrides():
    cfg = parse_cli_overrides(["model=dilresnet", "model.hidden_dim=32", "data.root=/x"])
    assert cfg.model.name == "dilresnet"
    assert cfg.model.hidden_dim == 32
    assert cfg.model.optimizer == "adam"
    assert cfg.data.root == "/x"

    resolved = cfg.resolved()
    assert resolved.data.batch_size == cfg.model.batch_size
    assert resolved.trainer.max_epochs == 4

    # yaml-typed values
    cfg2 = parse_cli_overrides(["model.learning_rate=1e-5", "model.noise_bcs=false"])
    assert cfg2.model.learning_rate == pytest.approx(1e-5)
    assert cfg2.model.noise_bcs is False

    # unknown keys rejected
    with pytest.raises(AttributeError):
        parse_cli_overrides(["model.nonexistent=1"])

    # round-trips through json
    cfg3 = Config.from_json(cfg.to_json())
    assert cfg3.model.hidden_dim == 32


def test_load_config_file_numeric_strings(tmp_path):
    """A checkpoint config.json (or YAML with dotless exponents) must load
    floats as floats — YAML 1.1 resolves '1e-06' as a string, which crashed
    the LR schedule when relaunching from ``config=<ckpt>/config.json``."""
    from generative_turbulence_tpu.training.config import load_config

    base = parse_cli_overrides(["model=diffusion", "data.root=/x"])
    js = tmp_path / "config.json"
    js.write_text(base.to_json())
    cfg = load_config(str(js))
    assert cfg.model.min_learning_rate == pytest.approx(1e-6)
    assert isinstance(cfg.model.min_learning_rate, float)

    ym = tmp_path / "config.yaml"
    ym.write_text(
        "model:\n  min_learning_rate: 1e-06\n  name: diffusion\n"
        "trainer:\n  train_limit: 3.3h\ndata:\n  root: /x\n"
    )
    cfg = load_config(str(ym))
    assert cfg.model.min_learning_rate == pytest.approx(1e-6)
    assert cfg.trainer.train_limit == "3.3h"  # non-numeric strings untouched


def test_parse_duration():
    assert parse_duration("24h") == 24 * 3600
    assert parse_duration("30m") == 1800
    assert parse_duration("90s") == 90
    assert parse_duration(None) is None
    with pytest.raises(ValueError):
        parse_duration("abc")


@pytest.fixture()
def tiny_config(synthetic_root, tmp_path):
    return parse_cli_overrides(
        [
            "model=diffusion",
            f"data.root={synthetic_root}",
            "data.discard_first_seconds=-1",
            "data.val_samples=2",
            "data.eval_batch_size=2",
            "model.batch_size=4",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=5",
            "model.cell_type_embedding_dim=4",
            f"trainer.out_dir={tmp_path}/run",
            "trainer.max_epochs=1",
            "trainer.check_val_every_n_epoch=1",
            "trainer.log_every_n_steps=1",
            "trainer.eval_testset=true",
            "data.test_samples=2",
        ]
    ).resolved()


def test_task_chunked_ddpm_matches_single_scan(tiny_config):
    """task.sample with sampler_chunk must equal the single-scan sampler for
    the same rng (host-chained spans; see diffusion_task._sample_ddpm_chunked)."""
    import dataclasses

    import jax

    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    dm, task = instantiate_data_and_task(tiny_config)
    batch = next(iter(dm.val_batches()))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(5)

    task.cfg = dataclasses.replace(task.cfg, sampler="ddpm", sampler_chunk=0)
    full = task.sample(state, batch, rng)
    task.cfg = dataclasses.replace(task.cfg, sampler_chunk=2)  # 2+2+1 of T=5
    chunked = task.sample(state, batch, rng)
    np.testing.assert_array_equal(chunked, full)


def test_eval_compute_dtype_f32_sampling_in_bf16_run(tiny_config):
    """model.eval_compute_dtype=float32 must sample through a float32 module
    while training stays bf16: the f32 sample equals the all-f32 task's
    sample bit-for-bit (params are f32 either way) and differs from the
    bf16 sampler's output."""
    import dataclasses

    import jax

    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = tiny_config
    cfg.model = dataclasses.replace(
        cfg.model, compute_dtype="bfloat16", eval_compute_dtype="float32"
    )
    dm, task = instantiate_data_and_task(cfg)
    assert task.eval_net is not task.net
    batch = next(iter(dm.val_batches()))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(5)
    mixed = task.sample(state, batch, rng)

    cfg.model = dataclasses.replace(
        cfg.model, compute_dtype="float32", eval_compute_dtype=None
    )
    _, task_f32 = instantiate_data_and_task(cfg)
    assert task_f32.eval_net is task_f32.net
    state_f32 = task_f32.init_state(jax.random.PRNGKey(0), batch)
    np.testing.assert_array_equal(task_f32.sample(state_f32, batch, rng), mixed)

    cfg.model = dataclasses.replace(
        cfg.model, compute_dtype="bfloat16", eval_compute_dtype=None
    )
    _, task_bf16 = instantiate_data_and_task(cfg)
    state_bf16 = task_bf16.init_state(jax.random.PRNGKey(0), batch)
    assert not np.array_equal(task_bf16.sample(state_bf16, batch, rng), mixed)

    # the training step still runs in bf16 with the mixed task
    state2, metrics = task.training_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/loss"]))


@pytest.mark.slow


def test_diffusion_end_to_end(tiny_config, synthetic_root, tmp_path):
    from generative_turbulence_tpu.training import Trainer
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    dm, task = instantiate_data_and_task(tiny_config)
    trainer = Trainer(tiny_config, task, dm)
    metrics = trainer.fit()

    # the monitored TKE metric was computed on the final validation
    assert "val/tke" in metrics
    # the test phase ran too (trainer.eval_testset)
    assert "test/tke" in metrics
    assert np.isfinite(metrics["val/tke"])
    # expensive metric ran on the final epoch
    assert "val/wasserstein" in metrics
    assert "val/max-mean-tke-pos" in metrics

    # metrics were logged to JSONL
    log_file = Path(tiny_config.trainer.out_dir) / "metrics.jsonl"
    records = [json.loads(line) for line in log_file.read_text().splitlines()]
    assert any("train/loss" in r for r in records)

    # checkpoints exist and embed the config
    ckpt_dir = Path(tiny_config.trainer.out_dir) / "checkpoints"
    assert (ckpt_dir / "last").exists()
    assert (ckpt_dir / "best").exists()
    stored = json.loads((ckpt_dir / "config.json").read_text())
    assert stored["model"]["name"] == "diffusion"

    # restore round-trip
    import jax
    from generative_turbulence_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    template = jax.tree_util.tree_map(np.asarray, trainer.state)
    restored = mgr.restore(template, "last")
    leaf0 = jax.tree_util.tree_leaves(restored.params)[0]
    leaf0_orig = jax.tree_util.tree_leaves(trainer.state.params)[0]
    np.testing.assert_allclose(np.asarray(leaf0), np.asarray(leaf0_orig))


@pytest.mark.slow


def test_dilresnet_end_to_end(synthetic_root, tmp_path):
    from generative_turbulence_tpu.training import Trainer, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = parse_cli_overrides(
        [
            "model=dilresnet",
            f"data.root={synthetic_root}",
            "data.discard_first_seconds=-1",
            "data.val_samples=2",
            "data.eval_batch_size=2",
            "model.batch_size=2",
            "model.hidden_dim=8",
            "model.N=1",
            "model.eval_unroll_steps=3",
            "model.sample_steps=[1,3]",
            "model.main_sample_step=3",
            "model.compute_expensive_sample_metrics=false",
            f"trainer.out_dir={tmp_path}/run-drn",
            "trainer.max_epochs=1",
            "trainer.check_val_every_n_epoch=1",
        ]
    ).resolved()

    dm, task = instantiate_data_and_task(cfg)
    trainer = Trainer(cfg, task, dm)
    metrics = trainer.fit()

    assert "val/loss" in metrics and np.isfinite(metrics["val/loss"])
    # per-step unroll MSE logged
    log_file = Path(cfg.trainer.out_dir) / "metrics.jsonl"
    text = log_file.read_text()
    assert "val/unroll/mse-u-1" in text
    # sample-step metrics present, incl. promoted main-step global name
    assert "val/3/tke" in metrics
    assert "val/tke" in metrics

    # running delta stats were tracked
    assert int(trainer.state.n_tracked) > 0
    assert not np.allclose(np.asarray(trainer.state.dx_var), 1.0)


@pytest.mark.slow


def test_tfnet_end_to_end(synthetic_root, tmp_path):
    from generative_turbulence_tpu.training import Trainer, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = parse_cli_overrides(
        [
            "model=tfnet",
            f"data.root={synthetic_root}",
            "data.discard_first_seconds=-1",
            "data.val_samples=2",
            "data.eval_batch_size=2",
            "model.batch_size=2",
            "model.context_window=4",
            "model.unroll_steps=2",
            "model.eval_unroll_steps=2",
            "model.temporal_filtering_length=2",
            f"trainer.out_dir={tmp_path}/run-tfnet",
            "trainer.max_epochs=1",
            "trainer.check_val_every_n_epoch=1",
        ]
    ).resolved()

    dm, task = instantiate_data_and_task(cfg)
    trainer = Trainer(cfg, task, dm)
    metrics = trainer.fit()
    assert "val/loss" in metrics and np.isfinite(metrics["val/loss"])
