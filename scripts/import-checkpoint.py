#!/usr/bin/env python
"""Import a reference (turbdiff) pretrained checkpoint into our format.

    python scripts/import-checkpoint.py turbdiff.ckpt <out_ckpt_dir> \
        data.root=/path/to/shapes [key=value ...]

Reads the PyTorch-Lightning ``.ckpt`` the reference distributes (zenodo, see
``/root/reference/README.md:197-205``), maps its hyper-parameters onto our
config, converts the ``state_dict`` tensor-by-tensor into our flax params
(``toolchain/import_ckpt.py``), cross-validates the diffusion schedule
buffers, and writes a self-contained checkpoint directory that
``scripts/eval_ckpt.py`` / ``trainer.resume_from`` can consume directly.

If the checkpoint pickle references turbdiff classes (e.g. the ``Variable``
enum in hparams), pass ``--reference-root /root/reference`` to unpickle
against the reference sources with lightweight dependency stubs.
"""

import argparse
import sys
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401  (adds repo root to sys.path)

HPARAM_MAP = {
    # reference DiffusionTraining.__init__ kwargs -> our ModelConfig fields
    # (turbdiff/models/diffusion.py:41-70)
    "dim": "dim",
    "timesteps": "timesteps",
    "beta_schedule": "beta_schedule",
    "loss": "loss",
    "norm_type": "norm_type",
    "time_embedding": "time_embedding",
    "actfn": "actfn",
    "optimizer": "optimizer",
    "learning_rate": "learning_rate",
    "min_learning_rate": "min_learning_rate",
    "learned_variances": "learned_variances",
    "elbo_weight": "elbo_weight",
    "detach_elbo_mean": "detach_elbo_mean",
    "clip_denoised": "clip_denoised",
    "noise_bcs": "noise_bcs",
    "cell_type_features": "cell_type_features",
    "cell_type_embedding_type": "cell_type_embedding_type",
    "cell_type_embedding_dim": "cell_type_embedding_dim",
    "cell_pos_features": "cell_pos_features",
    "normalization_mode": "normalization_mode",
    "with_geometry_embedding": "with_geometry_embedding",
}


def load_lightning_ckpt(
    path: Path, reference_root: str | None, trust_pickle: bool = False
):
    """Load the reference's Lightning ``.ckpt``.

    The checkpoint is DOWNLOADED content: a full unpickle executes arbitrary
    code from the file.  We therefore try ``weights_only=True`` first (safe:
    tensors + containers only, plus explicitly allow-listed enum types) and
    fall back to a full unpickle only with explicit ``--trust-pickle`` opt-in.
    """
    import torch

    try:
        try:
            # Allow-list the reference's Variable enum (appears in hparams)
            # without importing the untrusted package: safe_globals accepts
            # any class object, so a stand-in enum with the right
            # module/qualname would be needed; simplest is to try plain
            # weights_only first, which covers state_dict-only checkpoints.
            return torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            if not trust_pickle:
                raise SystemExit(
                    "checkpoint needs a full (code-executing) unpickle; it is "
                    "downloaded content, so this requires the explicit "
                    "--trust-pickle opt-in"
                )
            return torch.load(path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError:
        if not trust_pickle:
            raise SystemExit(
                "checkpoint needs a full (code-executing) unpickle; it is "
                "downloaded content, so this requires the explicit "
                "--trust-pickle opt-in"
            )
        if reference_root is None:
            raise SystemExit(
                "checkpoint pickle references reference-package classes; "
                "re-run with --reference-root <path to the turbdiff sources>"
            )
        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
        import _reference_stub

        _reference_stub.REFERENCE_ROOT = reference_root
        _reference_stub.load_reference_turbdiff()
        return torch.load(path, map_location="cpu", weights_only=False)


def hparams_to_overrides(hparams: dict) -> list[str]:
    overrides = []
    for ref_key, our_key in HPARAM_MAP.items():
        if ref_key not in hparams or hparams[ref_key] is None:
            continue
        overrides.append(f"model.{our_key}={hparams[ref_key]}")
    if "variables" in hparams:
        names = [getattr(v, "name", str(v)).lower() for v in hparams["variables"]]
        overrides.append(f"model.variables={','.join(names)}")
    return overrides


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="reference .ckpt file (PyTorch Lightning)")
    ap.add_argument("out_dir", help="output checkpoint directory")
    ap.add_argument("overrides", nargs="*", help="config overrides key=value")
    ap.add_argument("--reference-root", default=None,
                    help="turbdiff sources for unpickling custom classes")
    ap.add_argument("--trust-pickle", action="store_true",
                    help="allow a full code-executing unpickle of the "
                    "checkpoint (it is downloaded content; only pass this "
                    "for files you trust)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from generative_turbulence_tpu.diffusion.schedules import beta_schedule
    from generative_turbulence_tpu.toolchain.import_ckpt import (
        check_against,
        convert_state_dict,
    )
    from generative_turbulence_tpu.training.checkpoint import CheckpointManager
    from generative_turbulence_tpu.training.config import (
        Config,
        parse_cli_overrides,
    )
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    ckpt = load_lightning_ckpt(
        Path(args.ckpt), args.reference_root, trust_pickle=args.trust_pickle
    )
    hparams = dict(ckpt.get("hyper_parameters", {}))
    state_dict = {k: np.asarray(v) for k, v in ckpt["state_dict"].items()}

    overrides = ["model=diffusion"] + hparams_to_overrides(hparams)
    overrides += list(args.overrides)
    config = parse_cli_overrides(overrides, base=Config()).resolved()

    dm, task = instantiate_data_and_task(config)
    dm.setup("validate")
    example = next(iter(dm.val_batches()))
    template = task.init_state(jax.random.PRNGKey(0), example)

    params, buffers = convert_state_dict(
        state_dict, u_net_levels=config.model.u_net_levels
    )
    check_against(params, jax.tree.map(np.asarray, template.params["params"]))

    # Cross-validate the diffusion schedule against the checkpoint buffers.
    if "model.betas" in buffers:
        ours = beta_schedule(config.model.beta_schedule, config.model.timesteps)
        theirs = np.asarray(buffers["model.betas"], dtype=np.float64)
        err = float(np.max(np.abs(ours - theirs)))
        print(f"schedule check: max |betas_ours - betas_ckpt| = {err:.3e}")
        if err > 1e-6:
            print(
                "WARNING: schedule mismatch - check beta_schedule/timesteps",
                file=sys.stderr,
            )

    import jax.numpy as jnp

    full = dict(template.params)
    full["params"] = jax.tree.map(jnp.asarray, params)
    state = template.replace(params=full)
    if getattr(state, "ema_params", None) is not None:
        ema = dict(state.ema_params)
        ema["params"] = jax.tree.map(jnp.copy, full["params"])
        state = state.replace(ema_params=ema)

    mgr = CheckpointManager(Path(args.out_dir), config_json=config.to_json())
    mgr.save_last(state, step=0)
    mgr.save_best(state, step=0, value=float("inf"))
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    print(f"imported {n:,} parameters -> {args.out_dir}")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
