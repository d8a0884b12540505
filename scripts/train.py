#!/usr/bin/env python
"""Train a model: ``python scripts/train.py model=diffusion data.root=... [key=value ...]``

Hydra-style overrides over the typed config (see ``training/config.py``).
Examples:

    python scripts/train.py model=diffusion data.root=data/shapes \
        trainer.out_dir=runs/diff model.timesteps=500
    python scripts/train.py model=dilresnet data.root=data/shapes \
        data.discard_first_seconds=-1
    python scripts/train.py config=config/shapes_diffusion.yaml

Equivalent entry point to the reference's ``train.py:131-212``.
"""

import faulthandler
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

faulthandler.enable()
# SIGUSR1 dumps all thread stacks without killing the run — the only way to
# see where a process blocked on the remote-TPU tunnel is stuck.
try:
    import signal

    faulthandler.register(signal.SIGUSR1)
except (ImportError, AttributeError, ValueError):
    pass


def main(argv=None):
    # Multi-host bring-up must precede any backend use (no-op single-process).
    from generative_turbulence_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    import jax

    from generative_turbulence_tpu.training import Trainer, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    config = parse_cli_overrides(argv if argv is not None else sys.argv[1:]).resolved()

    if config.trainer.matmul_precision != "default":
        jax.config.update(
            "jax_default_matmul_precision", config.trainer.matmul_precision
        )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    dm, task = instantiate_data_and_task(config)
    trainer = Trainer(config, task, dm)
    metrics = trainer.fit()

    monitor = task.monitor
    score = metrics.get(monitor)
    print(f"final {monitor}: {score}", file=sys.stderr)
    return score


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
