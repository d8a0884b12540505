"""Shared bootstrap for the CLI scripts."""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from generative_turbulence_tpu.utils.hostmem import (  # noqa: E402,F401
    ensure_malloc_reuse,
    malloc_env,
)


def load_task_from_checkpoint(ckpt_dir, overrides=(), which="best"):
    """Rebuild datamodule + task from a checkpoint directory's embedded config
    (the self-contained protocol of the reference's ``scripts/eval_ckpt.py``:
    config travels inside the checkpoint) and restore the train state.
    """
    import jax
    import numpy as np

    from generative_turbulence_tpu.training.checkpoint import CheckpointManager
    from generative_turbulence_tpu.training.config import Config, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    ckpt_dir = Path(ckpt_dir)
    mgr = CheckpointManager(ckpt_dir)
    config = Config.from_json(mgr.config_json)
    if overrides:
        config = parse_cli_overrides(list(overrides), base=config)
    config = config.resolved()

    dm, task = instantiate_data_and_task(config)
    dm.setup("validate")

    rng = jax.random.PRNGKey(config.trainer.seed)
    example = next(iter(dm.val_batches()))
    template = task.init_state(rng, example)
    template = jax.tree_util.tree_map(np.asarray, template)
    if not (ckpt_dir / which).exists():
        which = "last"
    state = mgr.restore(template, which)
    return config, dm, task, state
