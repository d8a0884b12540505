import numpy as np
import pytest

import jax.numpy as jnp

from generative_turbulence_tpu.data import (
    CaseRepository,
    DataModule,
    EvaluationBatches,
    GeometryPureBatches,
    GridMap,
    Variable,
    embed_cells,
    gather_cells,
    find_data_files,
)
from generative_turbulence_tpu.data.dataset import CaseDataset, collate
from generative_turbulence_tpu.data.schema import BCType, FieldStats
from generative_turbulence_tpu.data.sequence import SequenceDataset
from generative_turbulence_tpu.utils.index import ravel_multi_index, unravel_index


def test_index_roundtrip():
    shape = (5, 7, 3)
    coords = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    coords = coords.reshape(-1, 3)
    flat = ravel_multi_index(coords, shape)
    assert np.array_equal(flat, np.arange(np.prod(shape)))
    back = unravel_index(flat, shape)
    assert np.array_equal(back, coords)


def test_variable_parsing():
    assert Variable.parse_tuple("u,p") == (Variable.U, Variable.P)
    assert Variable.U.dims == 3 and Variable.P.dims == 1
    assert Variable.GRAD.dims == 9


def test_schema_roundtrip(synthetic_root):
    files = find_data_files(synthetic_root / "train")
    assert len(files) == 2
    repo = CaseRepository(files, (Variable.U, Variable.P))
    meta = repo.read_metadata(0)

    assert meta.cell_counts.tolist() == [26, 12, 12]
    assert meta.n_cells < 24 * 10 * 10  # hole removes cells
    assert not meta.two_dimensional
    # In-domain cells never coincide with boundary cells
    for desc in meta.boundaries.values():
        assert not np.intersect1d(desc["idx"], meta.cell_idx).size

    # Boundary conditions parsed
    u_bcs = meta.boundary_conditions[Variable.U]
    assert u_bcs["inlets"].type is BCType.FIXED_VALUE
    assert u_bcs["inlets"].value.shape == (3,)
    assert u_bcs["outlets"].type is BCType.INLET_OUTLET

    data = repo.read(0, [0, 3, 2])
    assert data.fields[Variable.U].shape == (3, meta.n_cells, 3)
    assert data.fields[Variable.P].shape == (3, meta.n_cells, 1)
    # read with duplicate + unsorted indices preserves order
    d2 = repo.read(0, [3, 0, 3])
    assert np.allclose(d2.fields[Variable.U][0], data.fields[Variable.U][1])
    assert np.allclose(d2.fields[Variable.U][2], data.fields[Variable.U][1])


def test_grid_embedding_roundtrip(synthetic_root):
    files = find_data_files(synthetic_root / "train")
    repo = CaseRepository(files, (Variable.U, Variable.P))
    meta = repo.read_metadata(0)
    data = repo.read(0, [0, 1])

    variables = (Variable.U, Variable.P)
    grid = GridMap.from_metadata(meta, variables)
    cells = jnp.asarray(data.stacked_cells(variables))
    dense = embed_cells(cells, grid)

    assert dense.shape == (2, 26, 12, 12, 4)
    # gather undoes scatter
    back = gather_cells(dense, grid)
    assert np.allclose(np.asarray(back), np.asarray(cells))

    # Dirichlet values present at inlet padding cells: u_x == inflow
    inlet_idx = meta.boundaries["inlets"]["idx"]
    flat = np.asarray(dense).reshape(2, -1, 4)
    assert np.allclose(flat[:, inlet_idx, 0], 20.0)
    assert np.allclose(flat[:, inlet_idx, 1:3], 0.0)
    # walls: u == 0
    wall_idx = meta.boundaries["walls"]["idx"]
    assert np.allclose(flat[:, wall_idx, :3], 0.0)
    # outlets: p fixed 0, u NOT fixed (inlet-outlet -> stays zero scatter default)
    out_idx = meta.boundaries["outlets"]["idx"]
    assert np.allclose(flat[:, out_idx, 3], 0.0)

    # cells not in domain nor dirichlet are zero
    other = np.setdiff1d(
        np.arange(flat.shape[1]),
        np.concatenate([meta.cell_idx, inlet_idx, wall_idx, out_idx]),
    )
    assert np.allclose(flat[:, other], 0.0)


def test_cell_types(synthetic_root):
    files = find_data_files(synthetic_root / "train")
    repo = CaseRepository(files, (Variable.U,))
    meta = repo.read_metadata(0)
    types = meta.cell_types
    assert types.shape == tuple(meta.cell_counts)
    flat = types.reshape(-1)
    assert np.all(flat[meta.cell_idx] == 0)  # inside
    assert np.all(flat[meta.boundaries["inlets"]["idx"]] == 3)
    assert np.all(flat[meta.boundaries["outlets"]["idx"]] == 4)
    assert np.all(flat[meta.boundaries["walls"]["idx"]] == 2)


def test_normalizers(synthetic_root):
    stats = FieldStats.from_file(synthetic_root / "stats.pickle")
    variables = (Variable.U, Variable.P)

    mean, std = stats.normalizers(variables, "u:norm-max;p:abs-max")
    assert mean.shape == (4,) and std.shape == (4,)
    assert np.allclose(mean, 0.0)
    # u channels share norm-max scale
    assert std[0] == std[1] == std[2]
    assert std[0] == pytest.approx(float(stats.stats["norm(u)"]["max"]))
    p = stats.stats["p"]
    assert std[3] == pytest.approx(float(np.maximum(abs(p["min"]), abs(p["max"]))))

    mean2, std2 = stats.normalizers(variables, "mean-std")
    assert np.allclose(mean2[:3], stats.stats["u"]["mean"])
    assert np.allclose(std2[:3], stats.stats["u"]["std"])


def test_samplers_never_mix_geometries(synthetic_root):
    stats = FieldStats.from_file(synthetic_root / "stats.pickle")
    files = find_data_files(synthetic_root / "train")
    ds = CaseDataset(CaseRepository(files, (Variable.U,)), stats, 1.5e-4)
    # discard drops the first frame (times start at 1e-4)
    assert len(ds) == 2 * 11

    by_file = ds.sample_idxs_by_file()
    # default: ragged last chunks are padded to a constant batch size (static
    # shapes for jit), so every index is seen and batches never mix cases
    sampler = GeometryPureBatches(ds, batch_size=4, shuffle=True, seed=1)
    seen = []
    for batch in sampler:
        assert len(batch) == 4
        file_ids = {0 if idx in by_file[0] else 1 for idx in batch}
        assert len(file_ids) == 1
        seen.extend(batch)
    assert set(seen) == set(range(len(ds)))

    # without padding the batches partition the dataset exactly
    sampler = GeometryPureBatches(
        ds, batch_size=4, shuffle=True, seed=1, pad_to_full=False
    )
    seen = []
    for batch in sampler:
        assert len(batch) <= 4
        seen.extend(batch)
    assert sorted(seen) == list(range(len(ds)))

    # the epoch seeds the shuffle: successive epochs draw fresh orders, and
    # the same (seed, epoch) pair always replays the same order (resume)
    orders = [
        [tuple(b) for b in GeometryPureBatches(ds, batch_size=4, shuffle=True, seed=1, epoch=e)]
        for e in (0, 1, 0)
    ]
    assert orders[0] != orders[1]
    assert orders[0] == orders[2]

    eval_sampler = EvaluationBatches(ds, batch_size=3, samples_per_file=5)
    batches = list(eval_sampler)
    assert len(batches) == len(eval_sampler)
    # 5 samples per case, batch 3 -> 2 batches per case
    assert [len(b) for b in batches] == [3, 2, 3, 2]


def test_pooled_collate_matches_copying(synthetic_root):
    """The pooled producer must yield the same batches as the copying path
    (up to within-batch frame order, which is exchangeable); buffers must be
    fresh per yielded batch within the retention horizon."""

    def batches(buffer_pool):
        dm = DataModule(
            synthetic_root,
            discard_first_seconds=-1.0,
            batch_size=3,
            eval_batch_size=2,
            val_samples=4,
            variables=(Variable.U, Variable.P),
            device_prefetch=False,
            buffer_pool=buffer_pool,
            cell_bucket=512,
            seed=7,
        )
        dm.setup("fit")
        out = []
        for b in dm.train_batches():
            order = np.argsort(b.t, kind="stable")
            out.append((np.asarray(b.t)[order], np.asarray(b.cells)[order].copy()))
        return out

    pooled, copied = batches(True), batches(False)
    assert len(pooled) == len(copied)
    for (tp, cp), (tc, cc) in zip(pooled, copied):
        np.testing.assert_array_equal(tp, tc)
        np.testing.assert_array_equal(cp, cc)


def test_datamodule_end_to_end(synthetic_root):
    dm = DataModule(
        synthetic_root,
        discard_first_seconds=-1.0,
        batch_size=3,
        eval_batch_size=2,
        val_samples=4,
        variables=(Variable.U, Variable.P),
    )
    dm.setup("fit")
    batch = next(iter(dm.train_batches()))
    assert batch.cells.shape[0] <= 3
    assert batch.cells.shape[-1] == 4
    assert batch.grid.shape == (26, 12, 12)

    n_val = 0
    for b in dm.val_batches():
        assert b.batch_size <= 2
        n_val += b.batch_size
    assert n_val == 4  # 1 val case x 4 samples


def test_sequence_dataset(synthetic_root):
    stats = FieldStats.from_file(synthetic_root / "stats.pickle")
    files = find_data_files(synthetic_root / "train")
    ds = SequenceDataset(
        CaseRepository(files, (Variable.U,)),
        stats,
        sequence_length=3,
        stride=2,
        discard_first_seconds=-1.0,
    )
    # 12 frames, span = 3*2-1 = 5 -> 7 valid starts per case
    assert len(ds) == 2 * 7
    item = ds[[0, 1]]
    assert item.fields[Variable.U].shape[0:2] == (2, 3)
    # stride-2 windows: frames 0,2,4 and 1,3,5
    direct = ds.repo.read(0, [0, 2, 4])
    assert np.allclose(item.fields[Variable.U][0], direct.fields[Variable.U])


def test_collate_jit_compatible(synthetic_root):
    import jax

    stats = FieldStats.from_file(synthetic_root / "stats.pickle")
    files = find_data_files(synthetic_root / "train")
    ds = CaseDataset(CaseRepository(files, (Variable.U, Variable.P)), stats, -1.0)
    batch = collate(ds[[0, 1]], stats, (Variable.U, Variable.P))

    @jax.jit
    def dense_mean(cells, grid):
        return embed_cells(cells, grid).mean()

    val = dense_mean(jnp.asarray(batch.cells), batch.grid)
    assert np.isfinite(float(val))


def test_shard_files_by_host_single_process(synthetic_root):
    from generative_turbulence_tpu.data.dataset import shard_files_by_host

    files = find_data_files(synthetic_root / "train")
    # single process: passthrough either way
    assert shard_files_by_host(files, True) == files
    assert shard_files_by_host(files, False) == files


def test_datamodule_shard_by_host_flag(synthetic_root):
    dm = DataModule(
        synthetic_root,
        discard_first_seconds=-1.0,
        variables=(Variable.U,),
        shard_by_host=True,
    )
    dm.setup("fit")
    # single-process run sees everything; eval splits never shard
    assert dm.train_dataset.repo.n_cases == 2
    assert dm.val_dataset.repo.n_cases == 1


def test_gridmap_cache_reuses_instances(synthetic_root):
    files = find_data_files(synthetic_root / "train")
    repo = CaseRepository(files, (Variable.U, Variable.P))
    meta = repo.read_metadata(0)
    g1 = GridMap.from_metadata(meta, (Variable.U, Variable.P))
    g2 = GridMap.from_metadata(meta, (Variable.U, Variable.P))
    assert g1 is g2  # cached: no re-upload of the index arrays
    g3 = GridMap.from_metadata(meta, (Variable.U,))
    assert g3 is not g1
    g4 = GridMap.from_metadata(meta, (Variable.U, Variable.P), cached=False)
    assert g4 is not g1


def test_conditioning_cell_pos_features():
    import jax
    from generative_turbulence_tpu.models import Conditioning

    cond = Conditioning(
        cell_type_features=True, cell_type_embedding_dim=4, cell_pos_features=True
    )
    cell_types = jnp.zeros((6, 5, 4), dtype=jnp.int32)
    params = cond.init(jax.random.PRNGKey(0), cell_types)
    out = cond.apply(params, cell_types)
    assert out.shape == (6, 5, 4, 7)  # 4 embedding + 3 position channels
    assert cond.out_dim == 7
    pos = np.asarray(out[..., 4:])
    assert pos.min() == 0.0 and pos.max() == 1.0


class TestCellBucketing:
    """Bucket-padded index tables must be numerically identical to unpadded
    ones (scatter drops sentinels, gather fills zeros, norms use n_valid)."""

    def test_embed_gather_roundtrip_with_bucket(self, synthetic_root):
        from generative_turbulence_tpu.data.grid import (
            GridMap,
            embed_cells,
            gather_cells,
            masked_mean,
        )
        from generative_turbulence_tpu.data.schema import find_data_files, read_metadata
        from generative_turbulence_tpu.data.variables import Variable

        f = find_data_files(synthetic_root / "val")[0]
        meta = read_metadata(f)
        variables = (Variable.U, Variable.P)
        plain = GridMap.from_metadata(meta, variables, cached=False)
        bucketed = GridMap.from_metadata(meta, variables, cached=False, bucket=512)

        n = plain.n_cells
        assert bucketed.n_cells == n
        assert bucketed.cell_idx.shape[0] % 512 == 0
        assert bucketed.cell_idx.shape[0] > n

        rng = np.random.default_rng(0)
        vals = rng.normal(size=(2, n, 4)).astype(np.float32)
        vals_padded = np.zeros((2, bucketed.cell_idx.shape[0], 4), np.float32)
        vals_padded[:, :n] = vals

        dense_a = np.asarray(embed_cells(jnp.asarray(vals), plain))
        dense_b = np.asarray(embed_cells(jnp.asarray(vals_padded), bucketed))
        np.testing.assert_array_equal(dense_a, dense_b)

        back = np.asarray(gather_cells(jnp.asarray(dense_b), bucketed))
        np.testing.assert_array_equal(back[:, :n], vals)
        assert np.all(back[:, n:] == 0)

        m_a = np.asarray(masked_mean(jnp.asarray(dense_a) ** 2, plain))
        m_b = np.asarray(masked_mean(jnp.asarray(dense_b) ** 2, bucketed))
        np.testing.assert_allclose(m_a, m_b, rtol=1e-6)

    def test_bucketed_batches_share_one_compile(self, synthetic_root):
        """Different cases with unequal n_cells must produce identically-shaped
        jit arguments when bucketed."""
        from generative_turbulence_tpu.data.dataset import DataModule

        dm = DataModule(
            synthetic_root, discard_first_seconds=-1.0, batch_size=2,
            cell_bucket=512, device_prefetch=False,
        )
        dm.setup("fit")
        shapes = set()
        for batch in dm.train_batches():
            shapes.add(batch.cells.shape[1:] + batch.grid.cell_idx.shape)
        assert len(shapes) == 1

    @pytest.mark.slow

    def test_training_loss_invariant_to_bucketing(self, synthetic_root):
        import jax

        from generative_turbulence_tpu.data.dataset import DataModule
        from generative_turbulence_tpu.training.config import parse_cli_overrides
        from generative_turbulence_tpu.training.factory import instantiate_data_and_task

        losses = []
        for bucket in (0, 512):
            cfg = parse_cli_overrides(
                [
                    "model=diffusion",
                    f"data.root={synthetic_root}",
                    "data.discard_first_seconds=-1",
                    f"data.cell_bucket={bucket}",
                    "data.device_prefetch=false",
                    "model.batch_size=2",
                    "model.dim=8",
                    "model.u_net_levels=1",
                    "model.timesteps=4",
                ]
            ).resolved()
            dm, task = instantiate_data_and_task(cfg)
            batch = next(iter(dm.train_batches()))
            state = task.init_state(jax.random.PRNGKey(0), batch)
            _, metrics = task.training_step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(metrics["train/loss"]))
        assert losses[0] == pytest.approx(losses[1], rel=1e-5)
