"""Import the reference turbdiff package (read-only, /root/reference) for
numerical parity tests, stubbing the heavyweight deps that aren't installed
(pytorch-lightning, wandb, ...).  The reference model code itself only needs
torch / einops / numpy / scipy, which are available.

Used only by tests; the production import path (scripts/import-checkpoint.py)
never touches the reference package — it just unpickles a checkpoint file.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


class _StubMeta(type):
    def __getattr__(cls, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _make_class(name)


def _make_class(name: str = "Stub"):
    return _StubMeta(name, (), {"__init__": lambda self, *a, **k: None})


def _stub(name: str, **attrs):
    # Never shadow a module that is actually installed (the stubs exist only
    # to satisfy imports of packages absent from this environment).
    import importlib.util

    try:
        if name in sys.modules or importlib.util.find_spec(name) is not None:
            return sys.modules.get(name)
    except (ImportError, ModuleNotFoundError, ValueError):
        pass

    mod = types.ModuleType(name)
    mod.__file__ = f"<stub {name}>"

    def module_getattr(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return _make_class(attr)

    mod.__getattr__ = module_getattr
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _cachedmethod(*args, **kwargs):
    def wrap(fn):
        return fn

    return wrap


def _chunked(iterable, n):
    buf = []
    for item in iterable:
        buf.append(item)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def load_reference_turbdiff():
    """Return the reference ``turbdiff.models.ddpm`` and ``conditioning``
    modules, or raise ImportError if the reference tree is unavailable."""
    if "turbdiff.models.ddpm" in sys.modules:
        import turbdiff.models.conditioning as conditioning
        import turbdiff.models.ddpm as ddpm

        return ddpm, conditioning

    for name in ("pytorch_lightning", "pytorch_lightning.callbacks"):
        _stub(name)
    _stub("pytorch_lightning.utilities", rank_zero_only=lambda f: f)
    _stub(
        "cachetools",
        cachedmethod=_cachedmethod,
        LRUCache=lambda *a, **k: {},
        Cache=dict,
    )
    _stub("cachetools.keys", hashkey=lambda *a, **k: a)
    _stub("lightning_utilities")
    _stub("lightning_utilities.core")
    _stub(
        "lightning_utilities.core.apply_func",
        apply_to_collection=lambda data, dtype, fn, *a, **k: data,
    )
    _stub("more_itertools", chunked=_chunked)
    _stub("wandb", run=None)
    _stub("loky")
    _stub("hydra")
    _stub("omegaconf", DictConfig=dict)
    _stub("ot")
    _stub("torchmetrics")
    _stub("deadpool")

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import turbdiff.models.conditioning as conditioning
    import turbdiff.models.ddpm as ddpm

    return ddpm, conditioning
