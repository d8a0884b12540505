"""The GridMap device-index cache must be LRU with a BYTE bound.

A wholesale clear (the old behavior at 129 entries) would force every live
case to re-upload ~4 MB of index tables over the host->device tunnel; LRU
eviction keeps hot cases resident while bounding HBM.
"""

import numpy as np

from generative_turbulence_tpu.data.grid import _GRIDMAP_CACHE, _GridMapLRU, GridMap


class _FakeGrid:
    """Just enough surface for _GridMapLRU._nbytes."""

    def __init__(self, n):
        a = np.zeros(n, dtype=np.int32)
        self.cell_idx = a
        self.dirichlet_idx = a
        self.dirichlet_vals = np.zeros((n, 4), dtype=np.float32)
        self.cell_types = a
        self.inside_mask = np.zeros(n, dtype=bool)


def test_lru_evicts_oldest_by_bytes():
    g = _FakeGrid(1000)
    per = _GridMapLRU._nbytes(g)
    lru = _GridMapLRU(max_bytes=per * 3)
    for i in range(5):
        lru.put(("case", i), _FakeGrid(1000))
    # only the 3 most recent fit
    assert len(lru) == 3
    assert lru.get(("case", 0)) is None
    assert lru.get(("case", 1)) is None
    assert lru.get(("case", 4)) is not None


def test_lru_get_refreshes_recency():
    g = _FakeGrid(1000)
    per = _GridMapLRU._nbytes(g)
    lru = _GridMapLRU(max_bytes=per * 2)
    lru.put("a", _FakeGrid(1000))
    lru.put("b", _FakeGrid(1000))
    assert lru.get("a") is not None  # touch a -> b becomes LRU
    lru.put("c", _FakeGrid(1000))
    assert lru.get("a") is not None
    assert lru.get("b") is None


def test_lru_replace_same_key_updates_total():
    g = _FakeGrid(1000)
    per = _GridMapLRU._nbytes(g)
    lru = _GridMapLRU(max_bytes=per * 2)
    for _ in range(10):
        lru.put("a", _FakeGrid(1000))
    assert len(lru) == 1
    assert lru._total == per


def test_lru_never_evicts_sole_entry():
    lru = _GridMapLRU(max_bytes=1)  # smaller than any grid
    lru.put("a", _FakeGrid(1000))
    assert lru.get("a") is not None


def test_from_metadata_uses_lru(synthetic_root):
    from generative_turbulence_tpu.data.schema import find_data_files, read_metadata
    from generative_turbulence_tpu.data.variables import Variable

    files = find_data_files(synthetic_root / "train")
    meta = read_metadata(files[0])
    variables = (Variable.U, Variable.P)
    _GRIDMAP_CACHE.clear()
    g1 = GridMap.from_metadata(meta, variables)
    g2 = GridMap.from_metadata(meta, variables)
    assert g1 is g2
    assert len(_GRIDMAP_CACHE) == 1
