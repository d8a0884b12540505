"""Multi-host runtime bring-up.

The reference is strictly single-process (``config/train.yaml:25`` pins
``devices: 1``; ``turbdiff/models/metrics.py:41-43`` asserts non-distributed).
This module is the distributed runtime the TPU framework adds: an env-driven
``jax.distributed.initialize`` so the same ``scripts/train.py`` entry point
scales from one chip to a pod slice (ICI) or multi-host cluster (DCN), with
per-host sharded data loading (``data.shard_by_host``) and process-0-gated
writers downstream.

Activation (checked in order):

- ``GT_DIST_NUM_PROCESSES`` set: explicit cluster spec — also reads
  ``GT_DIST_COORDINATOR`` (default ``localhost:12321``) and
  ``GT_DIST_PROCESS_ID`` (required).  This is how the 2-process CPU test and
  manual clusters bring the runtime up.
- ``GT_DISTRIBUTED=1``: auto-detection (`jax.distributed.initialize()` with no
  arguments — TPU pods / cloud environments populate the cluster env vars).
- otherwise: no-op (single-process run).
"""

from __future__ import annotations

import os

_initialized = False


def initialize_distributed() -> bool:
    """Initialize jax.distributed from the environment.  Idempotent.

    Must run before jax initializes its backends (i.e. before any
    ``jax.devices()``/jit in the process).  Returns True iff a multi-process
    runtime was brought up.
    """
    global _initialized
    if _initialized:
        return True

    import jax

    n_str = os.environ.get("GT_DIST_NUM_PROCESSES")
    if n_str is not None:
        num_processes = int(n_str)
        if num_processes <= 1:
            return False
        coordinator = os.environ.get("GT_DIST_COORDINATOR", "localhost:12321")
        process_id = int(os.environ["GT_DIST_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        return True

    if os.environ.get("GT_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        _initialized = True
        return True

    return False


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def allgather_objects(obj):
    """All-gather a small JSON-serializable host object across processes.

    Returns ``[obj_from_rank0, obj_from_rank1, ...]`` on every rank (a
    single-process run returns ``[obj]``).  Payloads ride a padded uint8
    device all-gather (two collectives: lengths, then buffers), so this works
    on any backend without a shared filesystem — it is how distributed
    evaluation merges per-case metric dicts (a capability the reference
    forbids itself, ``turbdiff/models/metrics.py:41-43``).

    Collective: EVERY rank must call this the same number of times.
    """
    import jax

    if jax.process_count() <= 1:
        return [obj]

    import json

    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(obj).encode("utf-8"), dtype=np.uint8)
    lengths = np.asarray(
        multihost_utils.process_allgather(np.asarray([payload.size], np.int32))
    ).reshape(-1)
    buf = np.zeros(int(lengths.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [
        json.loads(bytes(gathered[rank, : int(n)]).decode("utf-8"))
        for rank, n in enumerate(lengths)
    ]
