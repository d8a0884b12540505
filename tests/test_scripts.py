"""End-to-end CLI surface: train.py -> eval_ckpt.py -> evaluate-runtime.py."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

ENV = {
    "PATH": "/usr/bin:/bin",
    "HOME": "/root",
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
}


def run(*args, timeout=560):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, capture_output=True, text=True,
        timeout=timeout, env=ENV,
    )


@pytest.fixture(scope="module")
def trained_run(synthetic_root, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("cli-run")
    res = run(
        "scripts/train.py",
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
    )
    assert res.returncode == 0, res.stderr[-3000:]
    return out_dir


@pytest.mark.slow


def test_train_cli_produces_artifacts(trained_run):
    assert (trained_run / "metrics.jsonl").is_file()
    assert (trained_run / "checkpoints" / "last").exists()
    assert (trained_run / "checkpoints" / "config.json").is_file()
    cfg = json.loads((trained_run / "checkpoints" / "config.json").read_text())
    assert cfg["model"]["sampler"] == "ddim"


@pytest.mark.slow


def test_eval_ckpt_cli(trained_run, tmp_path):
    out_h5 = tmp_path / "samples.h5"
    res = run("scripts/eval_ckpt.py", str(trained_run / "checkpoints"), str(out_h5))
    assert res.returncode == 0, res.stderr[-3000:]
    assert out_h5.is_file()
    metrics = json.loads(res.stdout)
    assert any(k.startswith("val/") for k in metrics)
    assert np.isfinite(metrics["val/tke"])


@pytest.mark.slow


def test_evaluate_runtime_cli(trained_run):
    res = run(
        "scripts/evaluate-runtime.py",
        str(trained_run / "checkpoints"),
        "--repeats", "1",
    )
    assert res.returncode == 0, res.stderr[-3000:]
    payload = json.loads(res.stdout)
    assert payload["sample_time"] > 0


def test_evaluate_dataset_cli(synthetic_root):
    res = run(
        "scripts/evaluate-dataset.py", str(synthetic_root), "--samples", "3"
    )
    assert res.returncode == 0, res.stderr[-3000:]
    metrics = json.loads(res.stdout)
    assert any(k.startswith("floor/") for k in metrics)


def test_trivial_baselines_cli(synthetic_root):
    res = run("scripts/trivial-baselines.py", str(synthetic_root), "--frames", "4")
    assert res.returncode == 0, res.stderr[-3000:]
    payload = json.loads(res.stdout)
    assert "mean-forecast" in payload["summary"]
    assert payload["summary"]["gaussian-smoothing"]["u"] >= 0
