"""Physical field variables and channel packing.

The framework stacks the per-variable channels of a snapshot into a single
feature axis.  Dense grids are channels-LAST ``(..., x, y, z, F)`` (TPU layout);
per-cell data is ``(..., n_cells, F)``.

Semantics mirror ``turbdiff/data/ofles.py:25-94`` (Variable enum and
split_channels) in the reference.
"""

from __future__ import annotations

import enum
from typing import Dict, Sequence, Tuple


class Variable(enum.Enum):
    # Primary fields stored in data.h5
    U = "u"
    P = "p"
    K = "k"
    NUT = "nut"

    # Derived fields (computed, never stored in data.h5)
    CURL = "curl"
    ENSTROPHY = "enstrophy"
    DIVERGENCE = "divergence"
    GRAD = "grad"

    @property
    def dims(self) -> int:
        if self in (Variable.U, Variable.CURL):
            return 3
        if self is Variable.GRAD:
            return 9
        return 1

    @property
    def key(self) -> str:
        """Dataset / stats key, e.g. ``u`` for Variable.U."""
        return self.value

    @staticmethod
    def from_str(name: str) -> "Variable":
        try:
            return Variable(name.strip().lower())
        except ValueError:
            raise ValueError(f"Unknown variable {name!r}") from None

    @staticmethod
    def parse_tuple(spec) -> Tuple["Variable", ...]:
        """Parse ``"u,p"`` or an iterable of names/Variables into a tuple."""
        if isinstance(spec, str):
            spec = [s for s in spec.split(",") if s.strip()]
        out = []
        for item in spec:
            out.append(item if isinstance(item, Variable) else Variable.from_str(item))
        return tuple(out)


def total_dims(variables: Sequence[Variable]) -> int:
    return sum(v.dims for v in variables)


def channel_slices(variables: Sequence[Variable]) -> Dict[Variable, slice]:
    """Slice of the stacked feature axis belonging to each variable."""
    out, start = {}, 0
    for v in variables:
        out[v] = slice(start, start + v.dims)
        start += v.dims
    return out


def split_channels(x, variables: Sequence[Variable], *, axis: int = -1):
    """Split a stacked feature axis into a dict of per-variable arrays."""
    out = {}
    for v, sl in channel_slices(variables).items():
        index = [slice(None)] * x.ndim
        index[axis] = sl
        out[v] = x[tuple(index)]
    return out


def stack_channels(fields: Dict[Variable, "object"], variables: Sequence[Variable], *, axis: int = -1):
    """Concatenate per-variable arrays along the feature axis in variable order."""
    import jax.numpy as jnp

    return jnp.concatenate([fields[v] for v in variables], axis=axis)
