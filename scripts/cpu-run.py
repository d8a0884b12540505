#!/usr/bin/env python
"""Run another script with JAX forced onto CPU.

    python scripts/cpu-run.py scripts/generate-shapes.py <args...>

The container's sitecustomize re-exports ``JAX_PLATFORMS=axon`` at
interpreter startup, so a shell-level ``JAX_PLATFORMS=cpu python ...`` prefix
is silently overwritten and the process still grabs the (single) TPU chip.
The env var must be overwritten from WITHIN the interpreter before the first
jax import — which is all this wrapper does.
"""

import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import ensure_malloc_reuse  # noqa: E402

# Re-exec for the warm-heap malloc env HERE, while argv still carries this
# wrapper: the target scripts call ensure_malloc_reuse() too, and if their
# call performs the re-exec, the rewritten sys.argv drops the wrapper and
# the child comes back up on the TPU backend (racing whatever owns the
# chip).  Doing it first sets the sentinel so the target's call is a no-op.
ensure_malloc_reuse()

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon PJRT plugin self-registers at interpreter start and ignores the
# env var; only the config knob actually forces the CPU backend here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if len(sys.argv) < 2:
    raise SystemExit(__doc__)
target = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(target, run_name="__main__")
