import dataclasses

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
        + [
            f"trainer.resume_from={tmp_path}/r1/checkpoints",
            # epochs are global: the resumed run starts at the epoch implied
            # by the restored step and trains up to max_epochs TOTAL
            "trainer.max_epochs=2",
        ]
    ).resolved()
    dm2, task2 = instantiate_data_and_task(cfg2)
    trainer2 = Trainer(cfg2, task2, dm2)
    trainer2.fit()
    # resumed state continues counting optimizer steps
    assert int(trainer2.state.step) == 2 * step1


@pytest.mark.slow


def test_resume_replays_unkilled_trajectory(synthetic_root, tmp_path):
    """A killed+resumed run must be step-for-step identical to an unkilled one.

    Control: train 2 epochs straight through, logging the loss every step.
    Treatment: train 1 epoch (checkpoint at the boundary), then resume into a
    fresh process-state with max_epochs=2.  The epoch-2 loss trajectory must
    match bit-for-bit: global epochs seed the same shuffle order, the step
    counter seeds the same per-step RNG, and the restored state (params, opt
    state, EMA) is exact.  This is the CPU-scale version of the TPU soak
    protocol (reference resume semantics: train.py:174-198).
    """
    import json

    from generative_turbulence_tpu.training import Trainer, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    def losses(run_dir):
        out = {}
        with open(run_dir / "metrics.jsonl") as f:
            for line in f:
                rec = json.loads(line)
                if "train/loss" in rec:
                    out[rec["step"]] = rec["train/loss"]
        return out

    per_step = ["trainer.log_every_n_steps=1", "trainer.check_val_every_n_epoch=10"]

    cfg_a = parse_cli_overrides(
        _base_overrides(synthetic_root, tmp_path / "a")
        + per_step
        + ["trainer.max_epochs=2"]
    ).resolved()
    dm, task = instantiate_data_and_task(cfg_a)
    Trainer(cfg_a, task, dm).fit()

    # b1 must keep the SAME schedule horizon as the control (the LR decay
    # horizon is max_epochs * n_batches), so it stops at the epoch boundary
    # via max_steps, not by lowering max_epochs.
    n_batches = None

    cfg_b1 = parse_cli_overrides(
        _base_overrides(synthetic_root, tmp_path / "b1")
        + per_step
        + ["trainer.max_epochs=2"]
    ).resolved()
    dm1, task1 = instantiate_data_and_task(cfg_b1)
    n_batches = dm1.n_train_batches()
    cfg_b1 = dataclasses.replace(
        cfg_b1, trainer=dataclasses.replace(cfg_b1.trainer, max_steps=n_batches)
    )
    t1 = Trainer(cfg_b1, task1, dm1)
    t1.fit()
    step1 = int(t1.state.step)
    assert step1 == n_batches

    cfg_b2 = parse_cli_overrides(
        _base_overrides(synthetic_root, tmp_path / "b2")
        + per_step
        + [f"trainer.resume_from={tmp_path}/b1/checkpoints", "trainer.max_epochs=2"]
    ).resolved()
    dm2, task2 = instantiate_data_and_task(cfg_b2)
    Trainer(cfg_b2, task2, dm2).fit()

    control, resumed = losses(tmp_path / "a"), losses(tmp_path / "b2")
    tail = {s: v for s, v in control.items() if s > step1}
    assert tail, "control run logged no post-resume steps"
    assert set(tail) == set(resumed)
    for s, v in tail.items():
        assert resumed[s] == v, f"loss diverged at step {s}: {resumed[s]} != {v}"


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
