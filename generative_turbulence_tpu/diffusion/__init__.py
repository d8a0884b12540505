from .schedules import beta_schedule  # noqa: F401
from .gaussian import (  # noqa: F401
    DiffusionConstants,
    GaussianDiffusion,
    ModelPrediction,
)
