import subprocess
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

from generative_turbulence_tpu.data.schema import FieldStats, find_data_files
from generative_turbulence_tpu.toolchain import analysis

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def case_file(synthetic_root):
    return find_data_files(synthetic_root / "train")[0]


class TestAnalysis:
    def test_dataset_stats(self, synthetic_root, tmp_path):
        files = find_data_files(synthetic_root / "train")
        out = tmp_path / "stats.pickle"
        stats = analysis.dataset_stats(files, out)
        loaded = FieldStats.from_file(out)
        for key in ("u", "p", "k", "nut", "norm(u)", "norm(curl)"):
            assert key in loaded.stats
        assert np.all(loaded.stats["u"]["max"] >= loaded.stats["u"]["min"])
        # norm(u) stats are scalars >= 0
        assert loaded.stats["norm(u)"]["mean"] > 0

    def test_mean_flow(self, case_file, tmp_path):
        out = analysis.mean_flow(case_file, tmp_path / "mf.h5", discard_first_seconds=-1)
        with h5py.File(out, "r") as f:
            u = np.asarray(f["data/u"])
            assert u.ndim == 2 and u.shape[1] == 3
        # matches the naive time mean
        with h5py.File(case_file, "r") as f:
            expect = np.asarray(f["data/u"]).mean(axis=0)
        np.testing.assert_allclose(u, expect, rtol=1e-5)

    def test_homogeneous_regions(self, case_file, tmp_path):
        out = tmp_path / "regions.npz"
        assignments = analysis.homogeneous_regions(
            case_file, out, k=8, max_cluster_size=500, discard_first_seconds=-1
        )
        with h5py.File(case_file, "r") as f:
            n_cells = f["data/u"].shape[1]
        assert assignments.shape == (n_cells,)
        sizes = np.bincount(assignments)
        assert len(sizes) >= 8
        assert sizes.max() <= 500
        assert np.load(out)["assignments"].shape == (n_cells,)

    def test_max_mean_tke(self, case_file, tmp_path):
        value = analysis.max_mean_tke(
            case_file, tmp_path / "mmt.npy", discard_first_seconds=-1
        )
        assert value >= 0
        assert float(np.load(tmp_path / "mmt.npy")) == value

    def test_first_turbulent_frame(self, case_file):
        frame = analysis.first_turbulent_frame(
            case_file, n_sphere=128, n_legendre=8, n_reference=4
        )
        assert 0 <= frame <= 12

    def test_autocorrelation(self, case_file, tmp_path):
        steps = analysis.autocorrelation(
            case_file, tmp_path / "ac.npz", discard_first_seconds=-1
        )
        data = np.load(tmp_path / "ac.npz")
        assert data["correlation"][0] == pytest.approx(1.0, abs=1e-3)
        assert steps == int(data["decorrelation_steps"])

    def test_split_h5(self, case_file, tmp_path):
        out = analysis.split_h5(case_file, tmp_path, fractions=(0.5, 0.25, 0.25))
        with h5py.File(case_file, "r") as f:
            T = len(f["data/times"])
        total = 0
        for split, path in out.items():
            with h5py.File(path, "r") as f:
                n = len(f["data/times"])
                total += n
                # non-data groups copied
                assert "grid" in f and "boundary-conditions" in f
        assert total == T


class TestScriptSurface:
    """Drive the actual CLI scripts (the toolchain's user surface)."""

    def run(self, *args):
        return subprocess.run(
            [sys.executable, *args],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=600,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        )

    def test_generate_shapes_smoke(self, tmp_path):
        out = tmp_path / "shapes"
        res = self.run(
            "scripts/generate-shapes.py",
            str(out),
            "--mock-solve",
            "--frames",
            "4",
            "--scale",
            "0.25",
            "--limit",
            "1",
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert (out / "stats.pickle").is_file()
        train_cases = list((out / "train").iterdir())
        assert len(train_cases) == 1
        case = train_cases[0]
        assert (case / "data.h5").is_file()
        assert (case / "mean-flow.h5").is_file()
        assert (case / "regions.npz").is_file()
        assert (case / "max-mean-tke.npy").is_file()

        # The generated dataset loads through the training data layer.
        from generative_turbulence_tpu.data import DataModule, Variable

        dm = DataModule(
            out,
            discard_first_seconds=-1.0,
            batch_size=2,
            variables=(Variable.U, Variable.P),
        )
        dm.setup("fit")
        # 4 mock frames minus the dropped first time dir = 3 usable frames
        assert len(dm.train_dataset) == 3
        batch = next(iter(dm.train_batches()))
        assert batch.cells.shape[0] in (1, 2)

    def test_case_analysis_cli(self, synthetic_root):
        file = find_data_files(synthetic_root / "train")[0]
        res = self.run(
            "scripts/case-analysis.py", str(file), "--max-mean-tke", "--discard", "-1"
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "max-mean-tke position" in res.stdout
