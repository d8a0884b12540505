from .stencils import (  # noqa: F401
    centered_difference,
    unpadded_derivative,
    divergence,
    curl,
    vector_gradient,
    enstrophy,
)
from .interp import interp3, resize_trilinear  # noqa: F401
from .quadrature import sphere_quadrature, gauss_legendre  # noqa: F401
from .spectra import (  # noqa: F401
    tke_field,
    tke_spectrum,
    log_tke_distance_matrix,
    SpectrumOps,
)
