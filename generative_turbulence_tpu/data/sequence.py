"""Sequence datasets for autoregressive baselines (TF-Net, DilResNet).

Each item is a window of ``sequence_length`` frames with ``stride`` between
them; reads B*T frames from one case and reshapes to (B, T, n_cells, F).
Mirrors the semantics of ``turbdiff/data/ofles_seq.py:24-199``.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from .dataset import (
    Batch,
    CaseData,
    CaseDataset,
    DeviceFrameCache,
    EvaluationBatches,
    GeometryPureBatches,
    prefetch,
)
from .grid import GridMap
from .schema import CaseRepository, FieldStats, find_data_files
from .variables import Variable


@dataclasses.dataclass
class SequenceBatch(Batch):
    """cells has shape (B, T, n_cells, F)."""

    @property
    def seq_len(self) -> int:
        return self.cells.shape[1]


class SequenceDataset(CaseDataset):
    def __init__(
        self,
        repo: CaseRepository,
        stats: FieldStats,
        *,
        sequence_length: int = 8,
        stride: int = 1,
        discard_first_seconds: float = -1.0,
    ):
        assert sequence_length >= 1 and stride >= 1
        self.sequence_length = sequence_length
        self.stride = stride
        super().__init__(repo, stats, discard_first_seconds)

    def reset_caches(self):
        self.repo.reset_caches()
        self.valid_steps = []
        for times in self.repo.times:
            idxs = np.nonzero(times > self.discard_first_seconds)[0]
            span = self.sequence_length * self.stride - 1
            if span > 0:
                idxs = idxs[:-span] if span < len(idxs) else idxs[:0]
            if len(idxs) and not np.all(np.diff(idxs) == 1):
                raise ValueError("Sequence windows require consecutive frames")
            self.valid_steps.append(idxs)

    def cache_steps(self, file_idx: int) -> np.ndarray:
        """Resident frames must cover every frame any window can touch: from
        the first window start through the last start + (T-1)*stride."""
        starts = self.valid_steps[file_idx]
        if len(starts) == 0:
            return np.asarray(starts)
        last = starts[-1] + (self.sequence_length - 1) * self.stride
        return np.arange(starts[0], last + 1)

    def __getitem__(self, index) -> CaseData:
        if isinstance(index, (int, np.integer)):
            index = [index]
        file_idx, local = self.locate(np.asarray(index))
        frame_idxs = [
            int(step)
            for idx in local
            for step in range(
                self.valid_steps[file_idx][idx],
                self.valid_steps[file_idx][idx] + self.sequence_length * self.stride,
                self.stride,
            )
        ]
        data = self.repo.read(file_idx, frame_idxs)
        T = self.sequence_length
        t = data.t.reshape(-1, T)
        fields = {v: arr.reshape(-1, T, *arr.shape[1:]) for v, arr in data.fields.items()}
        return CaseData(metadata=data.metadata, t=t, fields=fields)


def collate_sequence(
    data: CaseData,
    stats: FieldStats,
    variables: Sequence[Variable],
    cell_bucket: int = 0,
) -> SequenceBatch:
    variables = tuple(variables)
    cells = np.concatenate([data.fields[v] for v in variables], axis=-1)
    if cell_bucket:
        n = cells.shape[-2]
        pad = -(-n // cell_bucket) * cell_bucket - n
        if pad:
            cfg = [(0, 0)] * (cells.ndim - 2) + [(0, pad), (0, 0)]
            cells = np.pad(cells, cfg)
    return SequenceBatch(
        cells=cells,
        t=np.asarray(data.t),
        grid=GridMap.from_metadata(data.metadata, variables, bucket=cell_bucket),
        metadata=data.metadata,
        stats=stats,
        variables=variables,
    )


class SequenceDeviceCache(DeviceFrameCache):
    """Device-resident frames serving (B, T, n_cells, F) windows.

    Same residency model as DeviceFrameCache (whole cases uploaded once in
    bfloat16, bucket-padded), but a batch item is a window gather
    ``dev[start + arange(T) * stride]`` instead of a single frame.  A 10-frame
    TF-Net batch is ~420 MB of cell data — streaming it over this container's
    ~10 MB/s device link would cost 40x the device step.
    """

    def batch(
        self,
        dataset: "SequenceDataset",
        index: Sequence[int],
        stats: FieldStats,
        variables: Tuple[Variable, ...],
        cell_bucket: int,
        pool=None,
    ) -> Optional[SequenceBatch]:
        import jax.numpy as jnp

        file_idx, local = dataset.locate(np.asarray(index))
        dev = self._frames.get(file_idx)
        if dev is None:
            if self.full:
                return None
            dev = self._upload(dataset, file_idx, cell_bucket, variables, pool)
            if dev is None:
                return None
        T, s = dataset.sequence_length, dataset.stride
        # Window starts are consecutive valid frames (asserted in
        # reset_caches), so local position i is resident row i.  Sampler
        # order is preserved (the host path's read_frames restores it too).
        starts = np.asarray(local, dtype=np.int32)
        idx2d = starts[:, None] + np.arange(T, dtype=np.int32)[None, :] * s
        cells = dev[jnp.asarray(idx2d)]  # (B, T, nb, F) on-device gather
        frame0 = int(dataset.valid_steps[file_idx][0])
        times = dataset.repo.times[file_idx]
        t = times[np.asarray(frame0 + idx2d)]
        meta = dataset.repo.read_metadata(file_idx)
        return SequenceBatch(
            cells=cells,
            t=np.asarray(t),
            grid=GridMap.from_metadata(meta, variables, bucket=cell_bucket),
            metadata=meta,
            stats=stats,
            variables=variables,
        )


class SequenceDataModule:
    def __init__(
        self,
        root: Path,
        discard_first_seconds: float = -1.0,
        batch_size: int = 1,
        seq_len: int = 2,
        eval_batch_size: int = 8,
        eval_seq_len: int = 100,
        val_samples: int = 8,
        test_samples: int = 32,
        variables: Sequence[Variable] = (Variable.U, Variable.P),
        stride: int = 1,
        prefetch_size: int = 2,
        cell_bucket: int = 16384,
        seed: int = 0,
        device_cache_gb: float = 0.0,
        eval_device_cache_gb: float = 0.0,
    ):
        self.root = Path(root)
        self.discard_first_seconds = discard_first_seconds
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.eval_batch_size = eval_batch_size
        self.eval_seq_len = eval_seq_len
        self.val_samples = val_samples
        self.test_samples = test_samples
        self.variables = tuple(variables)
        self.stride = stride
        self.prefetch_size = prefetch_size
        self.cell_bucket = cell_bucket
        self.seed = seed
        # Separate cache instances per split: the frame-index keys would
        # collide across datasets.  Training frames quantize to bfloat16 (the
        # compute dtype); EVAL caches stay float32 so rollout context and
        # loss/unroll-MSE targets are bit-identical to the streaming path —
        # metrics must not shift when the cache is toggled (2x HBM for eval
        # windows is an acceptable price; eval residency is short-lived).
        self.train_cache = (
            SequenceDeviceCache(int(device_cache_gb * 1e9))
            if device_cache_gb > 0
            else None
        )
        self.val_cache = (
            SequenceDeviceCache(int(eval_device_cache_gb * 1e9), dtype="float32")
            if eval_device_cache_gb > 0
            else None
        )
        self.test_cache = (
            SequenceDeviceCache(int(eval_device_cache_gb * 1e9), dtype="float32")
            if eval_device_cache_gb > 0
            else None
        )

        self.stats: Optional[FieldStats] = None
        self.train_dataset: Optional[SequenceDataset] = None
        self.val_dataset: Optional[SequenceDataset] = None
        self.test_dataset: Optional[SequenceDataset] = None

    def setup(self, stage: str = "fit"):
        if self.stats is None:
            self.stats = FieldStats.from_file(self.root / "stats.pickle")
        if stage == "fit" and self.train_dataset is None:
            self.train_dataset = self._dataset("train", self.seq_len)
        if stage in ("fit", "validate") and self.val_dataset is None:
            self.val_dataset = self._dataset("val", self.eval_seq_len)
        if stage == "test" and self.test_dataset is None:
            self.test_dataset = self._dataset("test", self.eval_seq_len)

    def _dataset(self, phase: str, seq_len: int) -> SequenceDataset:
        files = find_data_files(self.root / phase)
        if not files:
            raise FileNotFoundError(f"No data.h5 files under {self.root / phase}")
        return SequenceDataset(
            CaseRepository(files, self.variables),
            stats=self.stats,
            sequence_length=seq_len,
            stride=self.stride,
            discard_first_seconds=self.discard_first_seconds,
        )

    def train_batches(self, epoch: int = 0) -> Iterator[SequenceBatch]:
        sampler = GeometryPureBatches(
            self.train_dataset,
            batch_size=self.batch_size,
            shuffle=True,
            seed=self.seed,
            epoch=epoch,
        )
        return self._iterate(self.train_dataset, sampler, cache=self.train_cache)

    def n_train_batches(self) -> int:
        return len(
            GeometryPureBatches(
                self.train_dataset, batch_size=self.batch_size, shuffle=True
            )
        )

    def val_batches(self) -> Iterator[SequenceBatch]:
        sampler = EvaluationBatches(
            self.val_dataset,
            batch_size=self.eval_batch_size,
            samples_per_file=self.val_samples,
        )
        return self._iterate(self.val_dataset, sampler, cache=self.val_cache)

    def test_batches(self) -> Iterator[SequenceBatch]:
        sampler = EvaluationBatches(
            self.test_dataset,
            batch_size=self.eval_batch_size,
            samples_per_file=self.test_samples,
        )
        return self._iterate(self.test_dataset, sampler, cache=self.test_cache)

    def _iterate(
        self, dataset: SequenceDataset, sampler, cache: Optional[SequenceDeviceCache] = None
    ) -> Iterator[SequenceBatch]:
        def gen():
            for idxs in sampler:
                if cache is not None:
                    batch = cache.batch(
                        dataset, idxs, self.stats, self.variables,
                        self.cell_bucket, None,
                    )
                    if batch is not None:
                        yield batch
                        continue
                yield collate_sequence(
                    dataset[idxs], self.stats, self.variables, self.cell_bucket
                )

        return prefetch(gen(), size=self.prefetch_size)
