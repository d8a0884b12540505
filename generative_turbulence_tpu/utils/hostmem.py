"""Host-memory tuning for lazily-backed VMs.

On this class of host (Firecracker-style microVM with lazily-faulted guest
RAM), first-touch of fresh anonymous memory runs at single-digit MB/s while
re-touching warm pages is RAM-speed.  glibc serves every allocation larger
than 128 KB with a private mmap and munmaps it on free, so each training
batch / HDF5 read target / H2D staging buffer re-pays the fault cost:
measured here, the data producer dropped from ~1 s to ~5 s per 42 MB batch,
capping training at ~0.2 steps/s.  Raising the mmap threshold makes glibc
serve big blocks from the (warm, reused) heap instead; disabling trim keeps
freed heap pages mapped.

glibc only reads these environment variables at process startup, so the fix
re-executes the interpreter once with them set.  Call ``ensure_malloc_reuse``
first thing in a CLI ``main()`` — never at import time (importers like pytest
or a driver harness must not be re-executed).
"""

import os
import sys

_SENTINEL = "GT_MALLOC_TUNED"

MALLOC_ENV = {
    # Serve allocations up to 1 GiB from the heap free list (reused, warm)
    # instead of fresh mmaps (re-faulted on every cycle).
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    # Never return heap pages to the kernel.
    "MALLOC_TRIM_THRESHOLD_": "-1",
}


def malloc_env(base: dict | None = None) -> dict:
    """Environment with the malloc tuning applied (for subprocesses)."""
    env = dict(os.environ if base is None else base)
    env.update(MALLOC_ENV)
    env[_SENTINEL] = "1"
    return env


def ensure_malloc_reuse() -> None:
    """Re-exec the current script once with glibc tuned for buffer reuse.

    No-op if already tuned (sentinel set) or if the platform does not use
    glibc env tuning (non-Linux).
    """
    if os.environ.get(_SENTINEL) == "1" or sys.platform != "linux":
        return
    argv = [sys.executable] + sys.argv
    # Resolve argv[0] so the exec'd child finds the script regardless of how
    # it was invoked; sys.argv[0] is already the script path under CPython.
    os.execve(sys.executable, argv, malloc_env())
