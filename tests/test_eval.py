import numpy as np
import pytest

from generative_turbulence_tpu.data import CaseRepository, Variable, find_data_files
from generative_turbulence_tpu.data.schema import FieldStats
from generative_turbulence_tpu.eval import (
    MaxMeanTKEPositionMetric,
    SampleMetricsCollection,
    SampleStore,
    WassersteinMetric,
    WassersteinTKE,
    emd2_uniform,
    wasserstein2,
)


class TestEMD:
    def test_square_matches_assignment(self):
        rng = np.random.default_rng(0)
        M = rng.uniform(size=(6, 6))
        val = emd2_uniform(M, use_native=False)
        from scipy.optimize import linear_sum_assignment

        r, c = linear_sum_assignment(M)
        assert val == pytest.approx(M[r, c].sum() / 6)

    def test_identity_zero(self):
        M = 1.0 - np.eye(5)
        assert emd2_uniform(M, use_native=False) == pytest.approx(0.0)

    def test_rectangular_lp(self):
        # transport 2 sources to 4 sinks: cost 0 pairs exist for a perfect split
        M = np.array([[0.0, 0.0, 1.0, 1.0], [1.0, 1.0, 0.0, 0.0]])
        assert emd2_uniform(M, use_native=False) == pytest.approx(0.0)
        M2 = np.ones((2, 4))
        assert emd2_uniform(M2, use_native=False) == pytest.approx(1.0)

    def test_wasserstein2(self):
        D = np.full((3, 3), 2.0)
        np.fill_diagonal(D, 0.0)
        assert wasserstein2(D, use_native=False) == pytest.approx(0.0)


class TestSampleStore:
    def test_roundtrip_and_reset(self, synthetic_root, tmp_path):
        files = find_data_files(synthetic_root / "val")
        repo = CaseRepository(files, (Variable.U, Variable.P))
        meta = repo.read_metadata(0)

        store = SampleStore(tmp_path / "samples.h5", (Variable.U, Variable.P))
        rng = np.random.default_rng(0)
        cells = rng.normal(size=(3, meta.n_cells, 4)).astype(np.float32)
        store.add_samples(cells[:2], meta)
        store.add_samples(cells[2:], meta)

        assert store.case_names == [meta.case_name]
        assert store.n_samples(meta.case_name) == 3
        loaded = store.load_samples(meta)
        assert loaded.n_samples == 3
        np.testing.assert_allclose(loaded.fields[Variable.U], cells[..., :3], rtol=1e-6)
        np.testing.assert_allclose(
            loaded.fields[Variable.P], cells[..., 3:], rtol=1e-6
        )

        store.reset()
        assert store.n_samples(meta.case_name) == 0
        # data not deleted; appending after reset overwrites
        store.add_samples(cells[:1], meta)
        assert store.n_samples(meta.case_name) == 1


@pytest.fixture(scope="module")
def val_setup(synthetic_root):
    files = find_data_files(synthetic_root / "val")
    repo = CaseRepository(files, (Variable.U, Variable.P))
    meta = repo.read_metadata(0)
    stats = FieldStats.from_file(synthetic_root / "stats.pickle")
    return repo, meta, stats


class TestMetrics:
    def test_tke_metric_on_real_frames(self, val_setup):
        repo, meta, stats = val_setup
        samples = repo.read(0, [2, 5, 8])
        data = repo.read(0, [3, 6, 9])
        metric = WassersteinTKE(n_sphere=512, n_legendre=16)
        out = metric(samples, data, stats)
        assert "tke" in out and "tke-back" in out
        assert np.isfinite(out["tke"]) and out["tke"] >= 0
        # real-vs-real should score better than noise-vs-real
        noise = repo.read(0, [2, 5, 8])
        for v in noise.fields:
            noise.fields[v] = np.random.default_rng(0).normal(
                size=noise.fields[v].shape
            ).astype(np.float32) * np.abs(noise.fields[v]).mean()
        out_noise = metric(noise, data, stats)
        assert out_noise["tke"] > out["tke"]

    def test_wasserstein_metric(self, val_setup):
        repo, meta, stats = val_setup
        samples = repo.read(0, [2, 5])
        data = repo.read(0, [3, 6])
        metric = WassersteinMetric(max_workers=1)
        out = metric(samples, data, stats)
        assert "wasserstein" in out
        assert np.isfinite(out["wasserstein"]) and out["wasserstein"] >= 0

    def test_wasserstein_metric_region_subsample(self, val_setup):
        """max_regions computes the same statistic over a region subset
        (the calibration fast path); full-set and seeded-subset values must
        be finite, and subsetting to ALL regions must be a no-op."""
        repo, meta, stats = val_setup
        samples = repo.read(0, [2, 5])
        data = repo.read(0, [3, 6])
        full = WassersteinMetric(max_workers=1)(samples, data, stats)
        same = WassersteinMetric(max_workers=1, max_regions=10_000)(
            samples, data, stats
        )
        assert same["wasserstein"] == pytest.approx(full["wasserstein"])
        sub = WassersteinMetric(max_workers=1, max_regions=2)(samples, data, stats)
        assert np.isfinite(sub["wasserstein"]) and sub["wasserstein"] >= 0

    def test_max_mean_tke_position(self, val_setup):
        repo, meta, stats = val_setup
        samples = repo.read(0, [2, 5, 8])
        out = MaxMeanTKEPositionMetric()(samples, samples, stats)
        assert "max-mean-tke-pos" in out
        assert out["max-mean-tke-pos"] >= 0

    def test_collection_end_to_end(self, val_setup, synthetic_root, tmp_path):
        repo, meta, stats = val_setup
        variables = (Variable.U, Variable.P)
        store = SampleStore(tmp_path / "val-samples.h5", variables)
        data = repo.read(0, [2, 5])
        store.add_samples(data.stacked_cells(variables), meta)

        collection = SampleMetricsCollection(
            "val",
            synthetic_root / "val",
            [WassersteinTKE(n_sphere=512, n_legendre=16), MaxMeanTKEPositionMetric()],
        )
        values = collection.compute(store, stats, expensive_metrics=False)
        assert "val/tke" in values
        assert f"val/{meta.case_name}/tke" in values
        assert np.isfinite(values["val/tke"])


class TestSinkhornSolverPath:
    @pytest.mark.slow
    def test_wasserstein_metric_sinkhorn_close_to_exact(self, val_setup):
        repo, meta, stats = val_setup
        samples = repo.read(0, [2, 5])
        data = repo.read(0, [3, 6])
        exact = WassersteinMetric(max_workers=1)(samples, data, stats)
        sink = WassersteinMetric(solver="sinkhorn")(samples, data, stats)
        assert sink["wasserstein"] == pytest.approx(
            exact["wasserstein"], rel=0.15
        )
