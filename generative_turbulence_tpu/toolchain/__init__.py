"""Data-production toolchain: OpenFOAM case generation, meshing, conversion,
and dataset statistics — the host-side L0/L1 layers of the framework.
"""

from .foam_dicts import (  # noqa: F401
    parse_foam,
    parse_foam_file,
    serialize_foam,
    edit_foam_file,
    FoamDict,
    Dimensioned,
    FoamList,
)
