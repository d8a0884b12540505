"""Pretrained-checkpoint import: reference torch state_dict -> our params.

The gold standard here is numerical parity: instantiate the reference's
actual ``DenoisingModel`` (from /root/reference, deps stubbed), convert its
randomly-initialized state_dict with ``toolchain.import_ckpt``, and compare
forward passes element-wise.  Skipped automatically if the reference tree or
torch is unavailable.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from generative_turbulence_tpu.models.conditioning import Conditioning  # noqa: E402
from generative_turbulence_tpu.models.unet import DenoisingModel  # noqa: E402
from generative_turbulence_tpu.toolchain.import_ckpt import (  # noqa: E402
    check_against,
    convert_state_dict,
)

try:
    import sys
    from pathlib import Path

    import torch

    sys.path.insert(0, str(Path(__file__).parent))
    from _reference_stub import load_reference_turbdiff

    ref_ddpm, ref_conditioning = load_reference_turbdiff()
    HAVE_REFERENCE = True
except Exception:  # pragma: no cover - environment without the reference
    HAVE_REFERENCE = False

needs_reference = pytest.mark.skipif(
    not HAVE_REFERENCE, reason="reference turbdiff package not importable"
)


def _ref_model(**kw):
    defaults = dict(
        in_features=4,
        out_features=4,
        c_local_features=0,
        c_global_features=0,
        timesteps=10,
        dim=8,
        u_net_levels=2,
        norm_type="group",
        with_geometry_embedding=False,
    )
    defaults.update(kw)
    torch.manual_seed(0)
    return ref_ddpm.DenoisingModel(**defaults)


def _state_dict_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _ref_forward(model, x_np, t_np, c_local_np=None):
    with torch.no_grad():
        x = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy())  # B,F,X,Y,Z
        t = torch.from_numpy(t_np.astype(np.int64))
        C = {}
        if c_local_np is not None:
            # reference C values are channels-first without a batch axis
            C[ref_conditioning.Conditioning.Type.CELL_TYPE] = torch.from_numpy(
                np.moveaxis(c_local_np, -1, 0).copy()
            )
        out = model(x, t, C)
        return np.moveaxis(out.numpy(), 1, -1)


def _our_params_from(sd, model_kwargs, example_args):
    """Convert + structurally validate against a fresh init of our model."""
    ours = DenoisingModel(**model_kwargs)
    # prefix the task-level key so the converter sees checkpoint-shaped names
    full_sd = {f"model.model.{k}": v for k, v in sd.items()}
    params, buffers = convert_state_dict(full_sd, model_kwargs["u_net_levels"])
    target = jax.eval_shape(ours.init, jax.random.PRNGKey(0), *example_args)
    check_against(params, target["params"])
    return ours, {"params": jax.tree.map(jnp.asarray, params)}


@needs_reference
@pytest.mark.parametrize("norm_type", ["group", "instance"])
def test_forward_parity_unconditional(norm_type):
    ref = _ref_model(norm_type=norm_type)
    sd = _state_dict_numpy(ref)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 12, 10, 10, 4)).astype(np.float32)
    t = np.array([3, 7], dtype=np.int32)

    ours, params = _our_params_from(
        sd,
        dict(out_features=4, timesteps=10, dim=8, u_net_levels=2,
             norm_type=norm_type, conditioning=None),
        (jnp.asarray(x), jnp.asarray(t)),
    )
    got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(t)))
    want = _ref_forward(ref, x, t)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@needs_reference
def test_forward_parity_with_conditioning_and_learned_variances():
    emb_dim = 4
    ref = _ref_model(c_local_features=emb_dim, out_features=8)
    sd = _state_dict_numpy(ref)
    # the checkpoint also carries the task-level cell-type embedding
    torch.manual_seed(1)
    ref_emb = torch.nn.Embedding(6, emb_dim)
    sd_task = {f"model.model.{k}": v for k, v in sd.items()}
    sd_task["conditioning.cell_type_embedding.embedding.weight"] = (
        ref_emb.weight.detach().numpy()
    )

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 12, 10, 10, 4)).astype(np.float32)
    t = np.array([0, 9], dtype=np.int32)
    cell_types = rng.integers(0, 6, size=(12, 10, 10)).astype(np.int32)

    ours = DenoisingModel(
        out_features=8, timesteps=10, dim=8, u_net_levels=2, norm_type="group",
        conditioning=Conditioning(cell_type_embedding_dim=emb_dim),
    )
    params, buffers = convert_state_dict(sd_task, u_net_levels=2)
    target = jax.eval_shape(
        ours.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(cell_types),
    )
    check_against(params, target["params"])
    params = {"params": jax.tree.map(jnp.asarray, params)}

    got = np.asarray(
        ours.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cell_types))
    )
    with torch.no_grad():
        c_local = ref_emb(torch.from_numpy(cell_types.astype(np.int64)))
    want = _ref_forward(ref, x, t, c_local_np=c_local.numpy())
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@needs_reference
def test_forward_parity_geometry_embedding():
    """The geometry-embedding path needs a near-real-scale grid (the front
    50-slice crop followed by three VALID 5x5x5 convs, ddpm.py:375-395)."""
    emb_dim = 3
    ref = _ref_model(
        c_local_features=emb_dim, with_geometry_embedding=True, dim=8,
        u_net_levels=1,
    )
    sd = _state_dict_numpy(ref)
    torch.manual_seed(2)
    ref_emb = torch.nn.Embedding(6, emb_dim)
    sd_task = {f"model.model.{k}": v for k, v in sd.items()}
    sd_task["conditioning.cell_type_embedding.embedding.weight"] = (
        ref_emb.weight.detach().numpy()
    )

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 50, 45, 45, 4)).astype(np.float32)
    t = np.array([5], dtype=np.int32)
    cell_types = rng.integers(0, 6, size=(50, 45, 45)).astype(np.int32)

    ours = DenoisingModel(
        out_features=4, timesteps=10, dim=8, u_net_levels=1, norm_type="group",
        with_geometry_embedding=True,
        conditioning=Conditioning(cell_type_embedding_dim=emb_dim),
    )
    params, _ = convert_state_dict(sd_task, u_net_levels=1)
    target = jax.eval_shape(
        ours.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(cell_types),
    )
    check_against(params, target["params"])
    params = {"params": jax.tree.map(jnp.asarray, params)}

    got = np.asarray(
        ours.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cell_types))
    )
    with torch.no_grad():
        c_local = ref_emb(torch.from_numpy(cell_types.astype(np.int64)))
    want = _ref_forward(ref, x, t, c_local_np=c_local.numpy())
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


@needs_reference
def test_schedule_buffers_surface_in_side_channel():
    ref = _ref_model()
    sd = {f"model.model.{k}": v for k, v in _state_dict_numpy(ref).items()}
    sd["model.betas"] = np.linspace(1e-4, 0.02, 10)
    params, buffers = convert_state_dict(sd, u_net_levels=2)
    assert "model.betas" in buffers


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        convert_state_dict({"model.model.bogus.weight": np.zeros(3)}, 2)


@needs_reference
@pytest.mark.slow
def test_import_checkpoint_cli_end_to_end(synthetic_root, tmp_path):
    """Craft a Lightning-style .ckpt from the reference's real model classes,
    run scripts/import-checkpoint.py, and sample from the imported state."""
    import subprocess
    from types import SimpleNamespace

    emb_dim = 4
    ref = _ref_model(
        in_features=4, out_features=4, c_local_features=emb_dim,
        dim=8, u_net_levels=2, timesteps=10, norm_type="group",
    )
    torch.manual_seed(3)
    ref_emb = torch.nn.Embedding(6, emb_dim)
    state_dict = {f"model.model.{k}": v for k, v in ref.state_dict().items()}
    state_dict["conditioning.cell_type_embedding.embedding.weight"] = (
        ref_emb.weight.detach()
    )

    from generative_turbulence_tpu.diffusion.schedules import beta_schedule

    state_dict["model.betas"] = torch.from_numpy(
        beta_schedule("log-snr-linear", 10)
    )
    ckpt = {
        "state_dict": state_dict,
        "hyper_parameters": {
            "dim": 8,
            "timesteps": 10,
            "beta_schedule": "log-snr-linear",
            "norm_type": "group",
            "cell_type_embedding_dim": emb_dim,
            "variables": (SimpleNamespace(name="U"), SimpleNamespace(name="P")),
            "with_geometry_embedding": False,
        },
    }
    ckpt_file = tmp_path / "turbdiff.ckpt"
    torch.save(ckpt, ckpt_file)

    out_dir = tmp_path / "imported"
    repo = Path(__file__).resolve().parents[1]
    result = subprocess.run(
        [
            sys.executable, str(repo / "scripts" / "import-checkpoint.py"),
            str(ckpt_file), str(out_dir), "--trust-pickle",
            f"data.root={synthetic_root}",
            "data.discard_first_seconds=-1", "data.val_samples=2",
            "model.u_net_levels=2", "model.batch_size=2",
            "model.eval_batch_size=2", "model.ema_decay=0",
        ],
        capture_output=True, text=True, env=None, cwd=str(repo),
    )
    assert result.returncode == 0, result.stderr
    assert "imported" in result.stdout
    assert "max |betas_ours - betas_ckpt| = 0" in result.stdout.replace(
        "0.000e+00", "0"
    )

    # The imported checkpoint is directly consumable by the eval tooling.
    sys.path.insert(0, str(repo / "scripts"))
    from _common import load_task_from_checkpoint

    config, dm, task, state = load_task_from_checkpoint(out_dir, which="best")
    got = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    )
    assert np.isfinite(got).all()
    batch = next(iter(dm.val_batches()))
    samples = task.sample(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(samples)).all()
