"""Multi-host runtime: 2-process CPU cluster vs single-process equivalence.

The reference is single-process by construction (``turbdiff/models/metrics.py:41``
asserts non-distributed); this tests the distributed runtime the TPU framework
adds — ``jax.distributed.initialize`` bring-up, per-host disjoint train-case
sharding, and a data-parallel training step whose loss/update matches the
single-process result.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "_dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker(root, out_json, extra_env, timeout=600):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("GT_DIST_NUM_PROCESSES", "GT_DIST_PROCESS_ID", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(root), str(out_json)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


@pytest.mark.slow


def test_two_process_cluster_matches_single_process(synthetic_root, tmp_path):
    port = _free_port()
    coordinator = f"localhost:{port}"

    # Two distributed workers + one single-process golden run, in parallel.
    procs = []
    for pid in range(2):
        procs.append(
            _run_worker(
                synthetic_root,
                tmp_path / f"dist{pid}.json",
                {
                    "GT_DIST_NUM_PROCESSES": "2",
                    "GT_DIST_PROCESS_ID": str(pid),
                    "GT_DIST_COORDINATOR": coordinator,
                },
            )
        )
    procs.append(_run_worker(synthetic_root, tmp_path / "single.json", {}))

    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    records = [
        json.loads((tmp_path / name).read_text())
        for name in ("dist0.json", "dist1.json", "single.json")
    ]
    d0, d1, single = records

    # Cluster actually formed: 2 processes, 2 global devices.
    assert d0["process_count"] == 2 and d1["process_count"] == 2
    assert d0["global_devices"] == 2

    # Per-host train-case shards are disjoint and cover all cases.
    files0, files1 = set(d0["files"]), set(d1["files"])
    assert files0 and files1
    assert not files0 & files1
    assert len(files0 | files1) == d0["n_total_files"]
    assert single["files"] and len(single["files"]) == single["n_total_files"]

    # The data-parallel step computes the same loss and lands on the same
    # parameters as the single-process run (replicated metrics agree between
    # the two ranks exactly).
    assert d0["loss"] == pytest.approx(d1["loss"], rel=1e-6)
    assert d0["loss"] == pytest.approx(single["loss"], rel=1e-5)
    assert d0["checksum"] == pytest.approx(single["checksum"], rel=1e-5)

    # The full task constructs on every rank; only rank 0 owns the writer.
    assert d0["store_is_writer"] is True
    assert d1["store_is_writer"] is False
    assert single["store_is_writer"] is True
