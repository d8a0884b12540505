"""Datasets, geometry-pure batch samplers, and the host->device input pipeline.

Invariant inherited from the reference (``turbdiff/data/ofles.py:483-548``):
a batch never mixes geometries, because the dense grid and index maps are per
case.  The train sampler shuffles frames within each case, chunks them into
batches, then shuffles batch order; the evaluation sampler picks
``samples_per_file`` evenly spaced (linspace) frames per case.

Instead of torch DataLoader worker processes, the pipeline is a host-thread
prefetcher (`prefetch`) that overlaps HDF5 reads + host collation with device
compute, feeding jit-ready `Batch` pytrees.
"""

from __future__ import annotations

import dataclasses
import math
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .grid import GridMap
from .schema import CaseMetadata, CaseRepository, FieldStats, find_data_files
from .variables import Variable, total_dims


@dataclasses.dataclass
class CaseData:
    """A set of frames from ONE case: metadata + times + per-variable cell data.

    fields: {Variable: (B, n_cells, dims) float32 numpy}
    """

    metadata: CaseMetadata
    t: np.ndarray
    fields: Dict[Variable, np.ndarray]

    @property
    def n_samples(self) -> int:
        return next(iter(self.fields.values())).shape[0]

    @property
    def variables(self) -> Tuple[Variable, ...]:
        return tuple(self.fields.keys())

    def stacked_cells(self, variables: Sequence[Variable]) -> np.ndarray:
        """(B, n_cells, F) channel-stacked cell values."""
        return np.concatenate([self.fields[v] for v in variables], axis=-1)


@dataclasses.dataclass
class Batch:
    """What a task step receives: cell values + the case's grid map + stats."""

    cells: np.ndarray  # (B, n_cells, F) stacked in variable order
    t: np.ndarray  # (B,) simulation times
    grid: GridMap
    metadata: CaseMetadata
    stats: FieldStats
    variables: Tuple[Variable, ...]

    @property
    def batch_size(self) -> int:
        return self.cells.shape[0]

    def device_put(self) -> "Batch":
        """Start the host-to-device transfer of the bulk array eagerly.

        Called from the prefetch thread, this double-buffers H2D: the next
        batch's transfer rides alongside the current step's compute instead
        of serializing into the jitted call's argument upload.  A no-op when
        ``cells`` is already a device array (device-resident frame cache)."""
        import jax

        if isinstance(self.cells, jax.Array):
            return self
        return dataclasses.replace(self, cells=jax.device_put(self.cells))


class CaseDataset:
    """Map-style dataset over the concatenated valid frames of all cases.

    ``discard_first_seconds`` drops the laminar ramp-up.  ``__getitem__`` takes
    a list of frame indices that must all land in one case.
    """

    def __init__(
        self,
        repo: CaseRepository,
        stats: FieldStats,
        discard_first_seconds: float = -1.0,
    ):
        self.repo = repo
        self.stats = stats
        self.discard_first_seconds = discard_first_seconds
        self.reset_caches()

    def reset_caches(self):
        self.repo.reset_caches()
        self.valid_steps = [
            np.nonzero(times > self.discard_first_seconds)[0]
            for times in self.repo.times
        ]

    def sample_idxs_by_file(self) -> List[List[int]]:
        out, i = [], 0
        for steps in self.valid_steps:
            out.append(list(range(i, i + len(steps))))
            i += len(steps)
        return out

    def cache_steps(self, file_idx: int) -> np.ndarray:
        """Frame indices DeviceFrameCache makes resident for this case.

        For plain frame datasets these are the valid steps; sequence datasets
        extend past the last window START to cover every frame a window can
        reach (see SequenceDataset.cache_steps)."""
        return np.asarray(self.valid_steps[file_idx])

    def __len__(self) -> int:
        return sum(len(v) for v in self.valid_steps)

    def locate(self, index: np.ndarray) -> Tuple[int, np.ndarray]:
        """Map global frame indices to (file_idx, local indices)."""
        index = np.asarray(index)
        file_idx = 0
        while index.min() >= len(self.valid_steps[file_idx]):
            index = index - len(self.valid_steps[file_idx])
            file_idx += 1
        if index.max() >= len(self.valid_steps[file_idx]):
            raise ValueError("All samples in a batch must come from the same geometry")
        return file_idx, index

    def __getitem__(self, index) -> CaseData:
        if isinstance(index, (int, np.integer)):
            index = [index]
        file_idx, local = self.locate(np.asarray(index))
        frame_idxs = [int(self.valid_steps[file_idx][i]) for i in local]
        return self.repo.read(file_idx, frame_idxs)

    def get_times(self, file_idx: int, times: Sequence[float]) -> CaseData:
        """Exact-time lookup (tenth-of-millisecond comparison)."""
        t = np.round(self.repo.times[file_idx] * 10_000).astype(int).tolist()
        idxs = [t.index(round(t_ * 10_000)) for t_ in times]
        return self.repo.read(file_idx, idxs)


class GeometryPureBatches:
    """Train batch sampler: shuffle within each case, never mix cases.

    ``pad_to_full`` tops up each case's ragged last chunk with extra random
    frames from the same case so every batch has the same static shape — on
    TPU a differently-sized last batch would otherwise recompile the train
    step (minutes per shape on remote-compile stacks).
    """

    def __init__(
        self,
        dataset,
        *,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        epoch: int = 0,
        pad_to_full: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.epoch = epoch
        self.seed = seed
        self.pad_to_full = pad_to_full

    def __len__(self) -> int:
        return sum(
            math.ceil(len(steps) / self.batch_size)
            for steps in self.dataset.valid_steps
        )

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng((self.seed, self.epoch))
        self.epoch += 1
        indices = self.dataset.sample_idxs_by_file()
        batches: List[List[int]] = []
        for idxs in indices:
            idxs = list(idxs)
            if self.shuffle:
                rng.shuffle(idxs)
            for i in range(0, len(idxs), self.batch_size):
                chunk = idxs[i : i + self.batch_size]
                short = self.batch_size - len(chunk)
                if short > 0 and self.pad_to_full:
                    pool = [j for j in idxs if j not in chunk] or idxs
                    extra = rng.choice(pool, size=short, replace=len(pool) < short)
                    chunk = chunk + [int(j) for j in extra]
                batches.append(chunk)
        if self.shuffle:
            rng.shuffle(batches)
        yield from batches


class EvaluationBatches:
    """Eval sampler: ``samples_per_file`` evenly spaced frames per case.

    ``shard=(rank, world)`` restricts iteration to the cases with
    ``case_idx % world == rank`` — distributed evaluation splits whole cases
    over hosts (the geometry-pure invariant maps onto ranks; metrics are
    merged afterwards, see ``eval.metrics.SampleMetricsCollection.compute``).
    """

    def __init__(
        self,
        dataset,
        *,
        batch_size: int,
        samples_per_file: int,
        shard: tuple = (0, 1),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.samples_per_file = samples_per_file
        self.shard = tuple(shard)

    def __len__(self) -> int:
        per_case = math.ceil(self.samples_per_file / self.batch_size)
        rank, world = self.shard
        n_mine = len(range(rank, self.dataset.repo.n_cases, world))
        return n_mine * per_case

    def __iter__(self) -> Iterator[List[int]]:
        rank, world = self.shard
        for case_idx, idxs in enumerate(self.dataset.sample_idxs_by_file()):
            if case_idx % world != rank:
                continue
            if not len(idxs):  # every frame discarded (short case)
                continue
            picks = np.round(
                np.linspace(0, len(idxs) - 1, num=self.samples_per_file)
            ).astype(int)
            chosen = [idxs[i] for i in picks]
            for i in range(0, len(chosen), self.batch_size):
                yield chosen[i : i + self.batch_size]


def shard_files_by_host(files, enabled: bool):
    """Round-robin the case files over hosts in multi-process runs.

    Cases stay whole per host (the geometry-pure batch invariant maps cleanly
    onto hosts); evaluation splits stay unsharded so metrics cover every case.
    The multi-host data-loading strategy the single-process reference lacks.
    """
    if not enabled:
        return files
    import jax

    n = jax.process_count()
    if n <= 1:
        return files
    idx = jax.process_index()
    sharded = files[idx::n]
    if not sharded:  # more hosts than cases: wrap around
        sharded = [files[idx % len(files)]]
    return sharded


def collate(
    data: CaseData,
    stats: FieldStats,
    variables: Sequence[Variable],
    cell_bucket: int = 0,
) -> Batch:
    variables = tuple(variables)
    cells = data.stacked_cells(variables)
    if cell_bucket:
        # Pad the cell axis to the bucket so every case in a bucket shares
        # one jit compilation (GridMap pads its index tables to match).
        n = cells.shape[1]
        pad = -(-n // cell_bucket) * cell_bucket - n
        if pad:
            cells = np.pad(cells, ((0, 0), (0, pad), (0, 0)))
    return Batch(
        cells=cells,
        t=np.asarray(data.t),
        grid=GridMap.from_metadata(data.metadata, variables, bucket=cell_bucket),
        metadata=data.metadata,
        stats=stats,
        variables=variables,
    )


class HostBufferPool:
    """Cycled pools of reusable host arrays for the batch producer.

    On lazily-backed VM hosts, first-touch of fresh anonymous pages is
    pathologically slow while warm pages are RAM-speed (see
    ``utils/hostmem.py``): the copying collate path allocates ~4x the batch
    size in fresh arrays per batch, capping training throughput at the page
    fault rate.  This pool serves every batch from warm, reused memory.

    Two kinds of buffers:

    - ``get(shape)``: round-robin over ``slots`` arrays per shape.  Used for
      buffers that OUTLIVE the producer iteration (the ``Batch.cells`` the
      consumer and an in-flight H2D transfer may still reference); ``slots``
      must exceed the max number of batches alive at once — prefetch queue
      (2) + consumer current + one in-flight transfer — with margin.
    - ``scratch(n_elements)``: one grow-only flat array per dtype, viewed and
      reshaped per call.  Only for buffers that die inside the producer step.
    """

    def __init__(self, slots: int = 6):
        self.slots = slots
        self._pools: Dict[Tuple, List[np.ndarray]] = {}
        self._next: Dict[Tuple, int] = {}
        self._scratch: Dict[str, np.ndarray] = {}

    def get(self, shape: Tuple[int, ...], dtype=np.float32) -> np.ndarray:
        key = (tuple(int(s) for s in shape), np.dtype(dtype).str)
        pool = self._pools.setdefault(key, [])
        if len(pool) < self.slots:
            pool.append(np.empty(key[0], dtype))
            return pool[-1]
        i = self._next.get(key, 0)
        self._next[key] = (i + 1) % self.slots
        return pool[i]

    def scratch(self, shape: Tuple[int, ...], dtype=np.float32) -> np.ndarray:
        key = np.dtype(dtype).str
        n = int(np.prod(shape))
        buf = self._scratch.get(key)
        if buf is None or buf.size < n:
            buf = self._scratch[key] = np.empty(n, dtype)
        return buf[:n].reshape(shape)


def collate_pooled(
    dataset: "CaseDataset",
    index: Sequence[int],
    stats: FieldStats,
    variables: Sequence[Variable],
    cell_bucket: int,
    pool: HostBufferPool,
) -> Batch:
    """Zero-allocation batch production into pooled host buffers.

    Reads each variable's frames straight from the HDF5 page cache into a
    pooled scratch view (``read_direct``), writes them into their channel
    slice of a pooled bucket-padded ``cells`` buffer, and reuses the cached
    ``GridMap``.  Frames are returned in sorted-frame order with ``t``
    aligned (batch order is irrelevant to both training and evaluation —
    samples within a batch are exchangeable).  Falls back to the copying
    :func:`collate` when a batch contains duplicate frames (rare
    ``pad_to_full`` top-up) since sorted fancy selections require strictly
    increasing indices.
    """
    variables = tuple(variables)
    file_idx, local = dataset.locate(np.asarray(index))
    steps = dataset.valid_steps[file_idx]
    frame_idxs = np.sort(np.asarray([int(steps[i]) for i in local]))
    if frame_idxs.size > 1 and np.any(np.diff(frame_idxs) == 0):
        return collate(dataset[index], stats, variables, cell_bucket)

    meta = dataset.repo.read_metadata(file_idx)
    B = int(frame_idxs.size)
    F = total_dims(variables)
    with dataset.repo.open(file_idx) as f:
        group = f["data"]
        n = int(group[variables[0].key].shape[1])
        nb = -(-n // cell_bucket) * cell_bucket if cell_bucket else n
        cells = pool.get((B, nb, F))
        c0 = 0
        sel = np.s_[frame_idxs.tolist()]
        for v in variables:
            dset = group[v.key]
            dims = int(dset.shape[2]) if dset.ndim == 3 else 1
            view = pool.scratch((B, n, dims) if dset.ndim == 3 else (B, n))
            dset.read_direct(view, sel)
            cells[:, :n, c0 : c0 + dims] = view.reshape(B, n, dims)
            c0 += dims
    if nb > n:
        cells[:, n:, :] = 0.0
    t = dataset.repo.times[file_idx][frame_idxs]
    return Batch(
        cells=cells,
        t=np.asarray(t),
        grid=GridMap.from_metadata(meta, variables, bucket=cell_bucket),
        metadata=meta,
        stats=stats,
        variables=variables,
    )


class DeviceFrameCache:
    """Keep whole training cases' frames device-resident in bfloat16.

    On hosts whose accelerator link is low-bandwidth (this container's axon
    tunnel sustains ~10 MB/s H2D while the device step is ~1 s), re-uploading
    ~35 MB of cell data per batch caps training at the link rate, not the
    chip: the r3 shapes run spent 3-4x the device step waiting on transfers.
    Each case's valid frames are uploaded ONCE — bucket-padded and cast to
    bfloat16, the training compute dtype — and every later batch is a single
    on-device gather.  Capacity-capped in bytes; once full (or on device OOM,
    which permanently disables further uploads) the remaining cases stream
    through the normal host path.

    The reference streams all data through torch DataLoader workers
    (``turbdiff/data/ofles.py:483-548``); residency is a TPU-native addition
    for remote-attached devices.
    """

    def __init__(self, capacity_bytes: int, dtype: str = "bfloat16"):
        self.capacity = int(capacity_bytes)
        # "bfloat16" (training: halves HBM + upload bytes) or "float32"
        # (eval caches: metric/loss targets must not be quantized).
        self.dtype = dtype
        self.itemsize = 2 if dtype == "bfloat16" else 4
        self.used = 0
        self.full = False
        self._frames: Dict[int, object] = {}  # file_idx -> (T, nb, F) device array
        # Private grow-only host staging buffers (NOT the shared batch pool:
        # two pool.scratch calls of one dtype would alias).  A single cast
        # buffer is safe because _upload fences the transfer before returning.
        self._stacked: Optional[np.ndarray] = None
        self._view: Optional[np.ndarray] = None
        self._cast: Optional[np.ndarray] = None

    def _grow(self, name: str, shape: Tuple[int, ...], dtype) -> np.ndarray:
        buf = getattr(self, name)
        n = int(np.prod(shape))
        if buf is None or buf.size < n:
            buf = np.empty(n, dtype)
            setattr(self, name, buf)
        return buf[:n].reshape(shape)

    def _upload(self, dataset: "CaseDataset", file_idx: int, cell_bucket: int,
                variables: Tuple[Variable, ...], pool: Optional[HostBufferPool]):
        import jax
        import jax.numpy as jnp

        steps = np.asarray(dataset.cache_steps(file_idx), dtype=np.int64)
        T = int(steps.size)
        F = total_dims(variables)
        with dataset.repo.open(file_idx) as f:
            group = f["data"]
            n = int(group[variables[0].key].shape[1])
            nb = -(-n // cell_bucket) * cell_bucket if cell_bucket else n
            nbytes = T * nb * F * self.itemsize
            if self.used + nbytes > self.capacity:
                self.full = True
                return None
            stacked = self._grow("_stacked", (T, nb, F), np.float32)
            c0 = 0
            sel = np.s_[steps.tolist()]
            for v in variables:
                dset = group[v.key]
                dims = int(dset.shape[2]) if dset.ndim == 3 else 1
                view = self._grow(
                    "_view", (T, n, dims) if dset.ndim == 3 else (T, n), np.float32
                )
                dset.read_direct(view, sel)
                stacked[:, :n, c0 : c0 + dims] = view.reshape(T, n, dims)
                c0 += dims
            if nb > n:
                stacked[:, n:, :] = 0.0
        cast = self._grow(
            "_cast", (T, nb, F),
            jnp.bfloat16 if self.dtype == "bfloat16" else np.float32,
        )
        np.copyto(cast, stacked, casting="unsafe")
        try:
            # jnp.array (copy=True semantics), NOT device_put: on CPU backends
            # device_put is zero-copy, and a resident array aliasing the
            # reused cast buffer would be silently overwritten by the next
            # case's upload.
            dev = jnp.array(cast)
            # Fence: fetch one element so the host buffer is reusable (plain
            # block_until_ready is unreliable on the axon backend).
            float(np.asarray(dev[0, 0, 0], dtype=np.float32))
        except Exception as e:  # RESOURCE_EXHAUSTED and friends: stop caching
            if "RESOURCE_EXHAUSTED" not in str(e) and "memory" not in str(e).lower():
                raise
            self.full = True
            return None
        self.used += nbytes
        self._frames[file_idx] = dev
        return dev

    def batch(
        self,
        dataset: "CaseDataset",
        index: Sequence[int],
        stats: FieldStats,
        variables: Tuple[Variable, ...],
        cell_bucket: int,
        pool: Optional[HostBufferPool],
    ) -> Optional[Batch]:
        """Produce a Batch from resident frames, or None to stream instead."""
        file_idx, local = dataset.locate(np.asarray(index))
        steps = dataset.valid_steps[file_idx]
        # Resident rows are ordered by valid-frame position, so batches gather
        # by LOCAL position (sorted: batch order is exchangeable, and sorted
        # gathers match collate_pooled's frame order for equivalence tests).
        positions = np.sort(np.asarray(local, dtype=np.int32))
        if positions.size > 1 and np.any(np.diff(positions) == 0):
            return None  # duplicate top-up frames: let the host path handle it
        dev = self._frames.get(file_idx)
        if dev is None:
            if self.full:
                return None
            dev = self._upload(dataset, file_idx, cell_bucket, variables, pool)
            if dev is None:
                return None
        cells = dev[positions]  # eager on-device gather, one dispatch
        frame_idxs = np.asarray([int(steps[i]) for i in positions])
        t = dataset.repo.times[file_idx][frame_idxs]
        meta = dataset.repo.read_metadata(file_idx)
        return Batch(
            cells=cells,
            t=np.asarray(t),
            grid=GridMap.from_metadata(meta, variables, bucket=cell_bucket),
            metadata=meta,
            stats=stats,
            variables=variables,
        )


def prefetch(iterator: Iterator, size: int = 2, transform=None) -> Iterator:
    """Run ``iterator`` in a host thread, keeping ``size`` items ready.

    Overlaps HDF5 I/O and host collation with device compute — the TPU-side
    replacement for torch DataLoader worker processes.  ``transform`` runs in
    the producer thread (e.g. ``Batch.device_put`` so the host-to-device
    transfer of the next batch overlaps the current step: double buffering).
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: List[BaseException] = []

    def producer():
        try:
            for item in iterator:
                q.put(transform(item) if transform is not None else item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


class DataModule:
    """Loads stats + per-split datasets from ``root/{train,val,test}/*/data.h5``."""

    def __init__(
        self,
        root: Path,
        discard_first_seconds: float = -1.0,
        batch_size: int = 1,
        eval_batch_size: int = 8,
        val_samples: int = 8,
        test_samples: int = 32,
        variables: Sequence[Variable] = (Variable.U, Variable.P),
        prefetch_size: int = 2,
        seed: int = 0,
        shard_by_host: bool = False,
        shard_eval: bool = False,
        device_prefetch: bool = True,
        cell_bucket: int = 16384,
        buffer_pool: bool = True,
        device_cache_gb: float = 0.0,
        transfer_dtype: Optional[str] = None,
    ):
        self.root = Path(root)
        self.discard_first_seconds = discard_first_seconds
        self.batch_size = batch_size
        self.eval_batch_size = eval_batch_size
        self.val_samples = val_samples
        self.test_samples = test_samples
        self.variables = tuple(variables)
        self.prefetch_size = prefetch_size
        self.seed = seed
        self.shard_by_host = shard_by_host
        self.shard_eval = shard_eval
        self.device_prefetch = device_prefetch
        self.cell_bucket = cell_bucket
        self.buffer_pool = buffer_pool
        # Residency/cast apply to TRAINING batches only: evaluation ground
        # truth stays float32 end to end so metric values are exact.
        self.device_cache = (
            DeviceFrameCache(int(device_cache_gb * 1e9)) if device_cache_gb > 0 else None
        )
        # bfloat16 halves H2D bytes on the slow remote-device link; implied
        # for streamed train batches when the device cache is on so the train
        # step compiles for ONE input dtype.
        if transfer_dtype is None and self.device_cache is not None:
            transfer_dtype = "bfloat16"
        if transfer_dtype not in (None, "bfloat16", "float32"):
            raise ValueError(f"transfer_dtype must be bfloat16/float32, got {transfer_dtype}")
        self.transfer_dtype = None if transfer_dtype == "float32" else transfer_dtype

        self.stats: Optional[FieldStats] = None
        self.train_dataset: Optional[CaseDataset] = None
        self.val_dataset: Optional[CaseDataset] = None
        self.test_dataset: Optional[CaseDataset] = None

    def setup(self, stage: str = "fit"):
        if self.stats is None:
            self.stats = FieldStats.from_file(self.root / "stats.pickle")
        if stage == "fit" and self.train_dataset is None:
            self.train_dataset = self._dataset("train")
        if stage in ("fit", "validate") and self.val_dataset is None:
            self.val_dataset = self._dataset("val")
        if stage == "test" and self.test_dataset is None:
            self.test_dataset = self._dataset("test")

    def _dataset(self, phase: str) -> CaseDataset:
        files = find_data_files(self.root / phase)
        if not files:
            raise FileNotFoundError(f"No data.h5 files under {self.root / phase}")
        files = shard_files_by_host(files, self.shard_by_host and phase == "train")
        return CaseDataset(
            CaseRepository(files, self.variables),
            stats=self.stats,
            discard_first_seconds=self.discard_first_seconds,
        )

    # Batch iterators --------------------------------------------------------

    def train_batches(self, epoch: int = 0) -> Iterator[Batch]:
        # The epoch seeds the shuffle (rng key = (seed, epoch)): each epoch
        # draws a fresh batch order, and a resumed run passing the same global
        # epoch replays the exact order of the run it resumes (soak protocol).
        sampler = GeometryPureBatches(
            self.train_dataset,
            batch_size=self.batch_size,
            shuffle=True,
            seed=self.seed,
            epoch=epoch,
        )
        return self._iterate(self.train_dataset, sampler, train=True)

    def n_train_batches(self) -> int:
        return len(
            GeometryPureBatches(
                self.train_dataset, batch_size=self.batch_size, shuffle=True
            )
        )

    def _eval_shard(self) -> tuple:
        if not self.shard_eval:
            return (0, 1)
        import jax

        return (jax.process_index(), jax.process_count())

    def first_val_case(self) -> Optional[str]:
        """Name of the case owning the globally-first val batch.

        Uses the UNSHARDED case ordering, so under ``shard_eval`` exactly one
        rank's iterator yields this case's first batch — the canonical batch
        for cross-rank-identical diagnostics (``Trainer.validate``)."""
        for case_idx, idxs in enumerate(self.val_dataset.sample_idxs_by_file()):
            if len(idxs):
                return self.val_dataset.repo.files[case_idx].parent.name
        return None

    def val_batches(self) -> Iterator[Batch]:
        sampler = EvaluationBatches(
            self.val_dataset,
            batch_size=self.eval_batch_size,
            samples_per_file=self.val_samples,
            shard=self._eval_shard(),
        )
        return self._iterate(self.val_dataset, sampler)

    def test_batches(self) -> Iterator[Batch]:
        sampler = EvaluationBatches(
            self.test_dataset,
            batch_size=self.eval_batch_size,
            samples_per_file=self.test_samples,
            shard=self._eval_shard(),
        )
        return self._iterate(self.test_dataset, sampler)

    def _iterate(
        self, dataset: CaseDataset, sampler, *, train: bool = False
    ) -> Iterator[Batch]:
        # The pool is safe precisely because of the bounded pipeline shape:
        # at most prefetch_size + 2 batches are alive at once, and slots=6
        # cycles reuse far behind that horizon.  Without device_prefetch the
        # consumer sees the pooled numpy array directly, which is only valid
        # if it does not retain batches — the training/eval loops do not.
        pool = HostBufferPool() if self.buffer_pool else None
        cache = self.device_cache if train else None
        cast_dtype = self.transfer_dtype if train else None

        def gen():
            for idxs in sampler:
                if cache is not None:
                    batch = cache.batch(
                        dataset, idxs, self.stats, self.variables,
                        self.cell_bucket, pool,
                    )
                    if batch is not None:
                        yield batch
                        continue
                if pool is not None:
                    yield collate_pooled(
                        dataset, idxs, self.stats, self.variables,
                        self.cell_bucket, pool,
                    )
                else:
                    yield collate(
                        dataset[idxs], self.stats, self.variables, self.cell_bucket
                    )

        if not self.device_prefetch:
            transform = None
        elif cast_dtype == "bfloat16":
            cast_pool = pool if pool is not None else HostBufferPool()

            def transform(batch: Batch) -> Batch:
                import jax
                import jax.numpy as jnp

                if isinstance(batch.cells, jax.Array):
                    return batch
                buf = cast_pool.get(batch.cells.shape, jnp.bfloat16)
                np.copyto(buf, batch.cells, casting="unsafe")
                return dataclasses.replace(batch, cells=jax.device_put(buf))
        else:
            transform = Batch.device_put
        return prefetch(gen(), size=self.prefetch_size, transform=transform)
