"""generative-turbulence-tpu: a TPU-native framework for generative modeling of
3D turbulent flows.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``martenlienen/generative-turbulence`` (ICLR 2024 "From Zero to Turbulence"):
conditional DDPM/DDIM diffusion over dense voxel grids of channel flow around
obstacles, autoregressive baselines (TF-Net, DilResNet), the OpenFOAM->HDF5
data pipeline, and turbulence-statistics evaluation (TKE spectra, Wasserstein
distances).

Layout
------
- ``data``      HDF5 schema, sparse<->dense grid embedding, samplers, synthetic cases
- ``ops``       differential stencils, interpolation, spectra, attention/norm kernels
- ``models``    denoising U-Net, TF-Net, DilResNet, conditioning (flax.linen)
- ``diffusion`` beta schedules, Gaussian diffusion core, DDPM/DDIM samplers
- ``training``  train loops, optimizers, checkpointing, logging, config
- ``parallel``  device meshes and sharding strategies
- ``eval``      sample store and turbulence metrics
- ``toolchain`` data-production pipeline (OpenFOAM dicts, meshing, conversion)

Internally every dense field uses the TPU-friendly channels-last layout
``(batch, x, y, z, features)``.
"""

__version__ = "0.1.0"
