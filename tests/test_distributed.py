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

    # The full task constructs on every rank; each rank owns its own store
    # file (rank 0 keeps the canonical name, rank 1 gets a suffix).
    assert d0["store_file"] == "val-samples.h5"
    assert d1["store_file"] == "val-samples.rank1.h5"
    assert single["store_file"] == "val-samples.h5"


EVAL_WORKER = REPO / "tests" / "_dist_eval_worker.py"


def _run_eval_worker(root, out_dir, out_json, extra_env, timeout=900):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("GT_DIST_NUM_PROCESSES", "GT_DIST_PROCESS_ID", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, str(EVAL_WORKER), str(root), str(out_dir), str(out_json)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


@pytest.mark.slow


def test_distributed_validate_matches_single_process(tmp_path):
    """Full distributed validate: per-host case shards -> per-rank sample
    stores -> all-gathered metric merge must equal the single-process result
    bit-for-bit (eval RNG is keyed on case identity, not iteration order)."""
    from generative_turbulence_tpu.data.synthetic import generate_synthetic_dataset

    root = tmp_path / "synth"
    generate_synthetic_dataset(
        root,
        n_train_cases=2,
        n_val_cases=3,
        n_test_cases=1,
        n_frames=12,
        cell_counts=(24, 10, 10),
        seed=0,
    )

    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(
            _run_eval_worker(
                root,
                tmp_path / "dist",
                tmp_path / f"dist{pid}.json",
                {
                    "GT_DIST_NUM_PROCESSES": "2",
                    "GT_DIST_PROCESS_ID": str(pid),
                    "GT_DIST_COORDINATOR": f"localhost:{port}",
                },
            )
        )
    procs.append(
        _run_eval_worker(root, tmp_path / "single", tmp_path / "single.json", {})
    )

    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}"

    d0, d1, single = [
        json.loads((tmp_path / name).read_text())
        for name in ("dist0.json", "dist1.json", "single.json")
    ]

    # Case shards are disjoint and cover all 3 val cases.
    cases0, cases1 = set(d0["store_cases"]), set(d1["store_cases"])
    assert cases0 and cases1
    assert not cases0 & cases1
    assert len(cases0 | cases1) == 3
    assert len(single["store_cases"]) == 3

    # The sample-amplitude diagnostics are per-rank batch means (each rank
    # only sees its own shard's batches) — everything else must merge.
    def merged_keys(record):
        return {k for k in record["metrics"] if not k.startswith("val/sample-")}

    # Every rank ends with the same merged metrics (consistent early-stopping
    # decisions cluster-wide) ...
    assert merged_keys(d0) == merged_keys(d1)
    for k in merged_keys(d0):
        assert d1["metrics"][k] == pytest.approx(
            d0["metrics"][k], rel=1e-6, abs=1e-9
        ), k

    # ... and the merged result equals the single-process validate exactly
    # (metric keys AND values: same per-case samples, same per-case metrics).
    assert merged_keys(d0) == merged_keys(single)
    for k in merged_keys(single):
        assert d0["metrics"][k] == pytest.approx(
            single["metrics"][k], rel=1e-5, abs=1e-8
        ), k
