"""Appendable HDF5 store of generated samples, grouped per case.

Schema (identical to the reference's so sample files interoperate,
``turbdiff/models/metrics.py:36-119``):

    <case_name>/data/<var>   (n, n_cells[, dims]) resizable, chunk = 1 sample
    <case_name>/data@n_samples

``reset()`` zeroes the ``n_samples`` attribute without deleting data.
Host-side only; callers gather in-domain cells before adding.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence

import h5py
import numpy as np

from ..data.dataset import CaseData
from ..data.schema import CaseMetadata
from ..data.variables import Variable, channel_slices


class SampleStore:
    def __init__(self, samples_file: Path, variables: Sequence[Variable]):
        # HDF5 writes are single-writer: in multi-host runs every rank writes
        # its OWN file (rank 0 keeps the canonical name, rank r>0 appends a
        # ``.rank<r>`` suffix) so distributed evaluation can shard cases over
        # hosts without write coordination; metrics are merged host-side via
        # an all-gather (the reference hard-asserts non-distributed,
        # ``turbdiff/models/metrics.py:41-43``).
        import jax

        self.rank = jax.process_index() if jax.process_count() > 1 else 0
        self.is_writer = True
        samples_file = Path(samples_file)
        if self.rank > 0:
            samples_file = samples_file.with_name(
                f"{samples_file.stem}.rank{self.rank}{samples_file.suffix}"
            )
        self.samples_file = samples_file
        self.variables = tuple(variables)
        self.samples_file.parent.mkdir(parents=True, exist_ok=True)

    def add_samples(self, cells: np.ndarray, metadata: CaseMetadata):
        """cells: (B, n_cells, F) stacked channel values at in-domain cells."""
        cells = np.asarray(cells)
        if cells.shape[1] > metadata.n_cells:
            # drop cell-bucket padding rows (zeros past the true cell count)
            cells = cells[:, : metadata.n_cells]
        slices = channel_slices(self.variables)
        with h5py.File(self.samples_file, "a") as f:
            data_group = f.require_group(metadata.case_name).require_group("data")
            n_prev = int(data_group.attrs.get("n_samples", 0))
            n_new = cells.shape[0]
            for v in self.variables:
                arr = cells[..., slices[v]]
                if v.dims == 1:
                    arr = arr[..., 0]
                name = v.key
                if name not in data_group:
                    data_group.create_dataset(
                        name,
                        data=arr,
                        chunks=(1, *arr.shape[1:]),
                        maxshape=(None, *arr.shape[1:]),
                    )
                else:
                    ds = data_group[name]
                    if ds.shape[0] < n_prev + n_new:
                        ds.resize(n_prev + n_new, axis=0)
                    ds[n_prev : n_prev + n_new] = arr
            data_group.attrs["n_samples"] = n_prev + n_new

    @property
    def case_names(self) -> List[str]:
        if not self.samples_file.is_file():
            return []
        with h5py.File(self.samples_file, "r") as f:
            return list(f.keys())

    def n_samples(self, case_name: str) -> int:
        with h5py.File(self.samples_file, "r") as f:
            return int(f[case_name]["data"].attrs.get("n_samples", 0))

    def load_samples(self, metadata: CaseMetadata) -> CaseData:
        with h5py.File(self.samples_file, "r") as f:
            group = f[metadata.case_name]["data"]
            n = int(group.attrs.get("n_samples", 0))
            fields = {}
            for v in self.variables:
                arr = np.asarray(group[v.key][:n], dtype=np.float32)
                if arr.ndim == 2:
                    arr = arr[..., None]
                fields[v] = arr
        return CaseData(metadata=metadata, t=np.zeros(n), fields=fields)

    def reset(self):
        if not self.samples_file.is_file():
            return
        with h5py.File(self.samples_file, "a") as f:
            for case_name in f.keys():
                f[case_name]["data"].attrs["n_samples"] = 0
