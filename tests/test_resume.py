import numpy as np
import pytest

import jax


def _base_overrides(synthetic_root, out_dir):
    return [
        "model=diffusion",
        f"data.root={synthetic_root}",
        "data.discard_first_seconds=-1",
        "data.val_samples=2",
        "data.eval_batch_size=2",
        "model.batch_size=4",
        "model.dim=8",
        "model.u_net_levels=1",
        "model.timesteps=4",
        "model.sampler=ddim",
        "model.ddim_steps=2",
        f"trainer.out_dir={out_dir}",
        "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=1",
        "trainer.render_plots=false",
    ]


@pytest.mark.slow


def test_resume_from_checkpoint(synthetic_root, tmp_path):
    from generative_turbulence_tpu.training import Trainer, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg1 = parse_cli_overrides(_base_overrides(synthetic_root, tmp_path / "r1")).resolved()
    dm, task = instantiate_data_and_task(cfg1)
    trainer = Trainer(cfg1, task, dm)
    trainer.fit()
    step1 = int(trainer.state.step)
    assert step1 > 0

    cfg2 = parse_cli_overrides(
        _base_overrides(synthetic_root, tmp_path / "r2")
        + [f"trainer.resume_from={tmp_path}/r1/checkpoints"]
    ).resolved()
    dm2, task2 = instantiate_data_and_task(cfg2)
    trainer2 = Trainer(cfg2, task2, dm2)
    trainer2.fit()
    # resumed state continues counting optimizer steps
    assert int(trainer2.state.step) == 2 * step1


@pytest.mark.slow


def test_early_stopping(synthetic_root, tmp_path):
    from generative_turbulence_tpu.training import Trainer, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = parse_cli_overrides(
        _base_overrides(synthetic_root, tmp_path / "es")
        + [
            "trainer.max_epochs=4",
            "trainer.early_stopping_patience=1",
            # effectively no learning -> identical samples each validation ->
            # the monitor cannot improve
            "model.learning_rate=1e-30",
            "model.lr_decay=null",
        ]
    ).resolved()
    dm, task = instantiate_data_and_task(cfg)
    trainer = Trainer(cfg, task, dm)
    trainer.fit()
    # with patience 1, training stops after the 2nd stale validation epoch
    n_epochs_run = int(trainer.state.step) // dm.n_train_batches()
    assert n_epochs_run < 4
