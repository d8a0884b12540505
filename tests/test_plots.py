from pathlib import Path

import numpy as np
import pytest

from generative_turbulence_tpu.data import CaseRepository, Variable, find_data_files
from generative_turbulence_tpu.data.schema import FieldStats
from generative_turbulence_tpu.eval.metrics import (
    SampleMetricsCollection,
    WassersteinTKE,
)
from generative_turbulence_tpu.eval.plots import (
    PlotCallback,
    plot_slice,
    plot_tke_spectrum,
    render_eval_plots,
)
from generative_turbulence_tpu.eval.sample_store import SampleStore

matplotlib = pytest.importorskip("matplotlib")


@pytest.fixture(scope="module")
def case(synthetic_root):
    files = find_data_files(synthetic_root / "val")
    repo = CaseRepository(files, (Variable.U, Variable.P))
    return repo, repo.read_metadata(0)


def test_plot_slice(case, tmp_path):
    repo, meta = case
    sample = repo.read(0, [2, 3])
    data = repo.read(0, [5, 6])
    out = plot_slice(
        sample,
        data,
        (Variable.U, Variable.P, Variable.CURL),
        tmp_path / "slice.png",
    )
    assert out.is_file() and out.stat().st_size > 1000


def test_plot_tke_spectrum(tmp_path):
    k = np.geomspace(1, 10, 16)
    log_a = np.log(np.stack([k**-5 / 3 * (1 + 0.1 * i) for i in range(3)]))
    log_b = np.log(np.stack([k**-5 / 3 * (1 + 0.05 * i) for i in range(2)]))
    out = plot_tke_spectrum(log_a, log_b, k, tmp_path / "spec.png", title="t")
    assert out.is_file()


def test_render_eval_plots(case, synthetic_root, tmp_path):
    repo, meta = case
    variables = (Variable.U, Variable.P)
    stats = FieldStats.from_file(synthetic_root / "stats.pickle")

    store = SampleStore(tmp_path / "s.h5", variables)
    data = repo.read(0, [2, 5])
    store.add_samples(data.stacked_cells(variables), meta)

    tke = WassersteinTKE(n_sphere=128, n_legendre=8)
    collection = SampleMetricsCollection("val", synthetic_root / "val", [tke])
    collection.compute(store, stats, expensive_metrics=False)

    paths = render_eval_plots(tmp_path / "run", store, collection, variables, "val", 7)
    assert len(paths) >= 3  # spectra (3 regions) + 2 slices
    for p in paths:
        assert Path(p).is_file()
