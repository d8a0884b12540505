import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_turbulence_tpu.models import (
    Conditioning,
    DenoisingModel,
    DilResNet,
    NyquistFrequencyEmbedding,
    TFNet,
)
from generative_turbulence_tpu.models.blocks import ResnetBlock, UNet, VoxelAttention
from generative_turbulence_tpu.models.embeddings import nyquist_scale_bias


def test_nyquist_embedding_properties():
    dim, T = 32, 500
    scale, bias = nyquist_scale_bias(dim, T)
    assert scale.shape == (dim,) and bias.shape == (dim,)
    # frequencies repeat in sin/cos pairs
    np.testing.assert_allclose(scale[0::2], scale[1::2])
    np.testing.assert_allclose(bias[0::2], 0.0)
    np.testing.assert_allclose(bias[1::2], np.pi / 2)
    # slowest frequency: 2*pi*(1/8)/T
    assert scale[0] == pytest.approx(2 * np.pi / 8 / T)

    emb = NyquistFrequencyEmbedding(dim, T)
    out = emb.apply({}, jnp.asarray([0.0, 250.0, 499.0]))
    assert out.shape == (3, dim)
    # embeddings distinct across timesteps
    assert not np.allclose(out[0], out[1])
    # at t=0: sin(bias) -> alternating 0, 1
    np.testing.assert_allclose(np.asarray(out[0][0::2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0][1::2]), 1.0, atol=1e-6)


def test_resnet_block_film():
    rng = jax.random.PRNGKey(0)
    block = ResnetBlock(features=16, actfn=jax.nn.silu, norm_type="group")
    x = jnp.ones((2, 6, 5, 4, 8))
    c = jnp.ones((2, 12))
    params = block.init(rng, x, c)
    y = block.apply(params, x, c)
    assert y.shape == (2, 6, 5, 4, 16)
    # FiLM actually modulates: different c -> different output
    y2 = block.apply(params, x, 2.0 * c)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


@pytest.mark.parametrize("kind", ["full", "linear", "local"])
def test_voxel_attention_kinds(kind):
    rng = jax.random.PRNGKey(0)
    attn = VoxelAttention(heads=2, dim_head=8, kind=kind, window_size=4)
    x = jax.random.normal(rng, (2, 6, 5, 7, 16))
    params = attn.init(rng, x)
    y = attn.apply(params, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow


def test_unet_odd_shapes_roundtrip():
    # The interpolation U-Net must handle non-power-of-two grids (incl. the
    # floor-at-3 rule) and return the exact input spatial shape.
    rng = jax.random.PRNGKey(0)
    unet = UNet(dim=8, levels=3, actfn=jax.nn.silu, norm_type="group")
    x = jax.random.normal(rng, (1, 13, 7, 5, 8))
    c = jnp.ones((1, 8))
    params = unet.init(rng, x, c)
    y = unet.apply(params, x, c)
    assert y.shape == (1, 13, 7, 5, 8)


def test_denoising_model_forward():
    rng = jax.random.PRNGKey(0)
    cond = Conditioning(cell_type_features=True, cell_type_embedding_dim=4)
    model = DenoisingModel(
        out_features=4,
        timesteps=100,
        dim=8,
        u_net_levels=2,
        conditioning=cond,
    )
    x = jax.random.normal(rng, (2, 12, 8, 6, 4))
    t = jnp.asarray([3, 77])
    cell_types = jnp.zeros((12, 8, 6), dtype=jnp.int32)
    params = model.init(rng, x, t, cell_types)
    y = model.apply(params, x, t, cell_types)
    assert y.shape == (2, 12, 8, 6, 4)
    # timestep changes output
    y2 = model.apply(params, x, jnp.asarray([90, 4]), cell_types)
    assert not np.allclose(np.asarray(y), np.asarray(y2), atol=1e-5)

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert n_params > 1000


def test_denoising_model_learned_variances_output_dim():
    rng = jax.random.PRNGKey(0)
    model = DenoisingModel(out_features=8, timesteps=10, dim=8, u_net_levels=1)
    x = jnp.ones((1, 8, 6, 6, 4))
    t = jnp.asarray([0])
    params = model.init(rng, x, t)
    y = model.apply(params, x, t)
    assert y.shape == (1, 8, 6, 6, 8)


def test_dilresnet_forward():
    rng = jax.random.PRNGKey(0)
    cond = Conditioning(cell_type_embedding_dim=8)
    model = DilResNet(n_features=4, N=2, hidden_dim=16, conditioning=cond)
    x = jax.random.normal(rng, (2, 10, 8, 6, 4))
    cell_types = jnp.zeros((10, 8, 6), dtype=jnp.int32)
    params = model.init(rng, x, cell_types)
    y = model.apply(params, x, cell_types)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow


def test_tfnet_forward():
    rng = jax.random.PRNGKey(0)
    cond = Conditioning(cell_type_embedding_dim=8)
    model = TFNet(
        n_features=4,
        context_window=6,
        temporal_filtering_length=4,
        conditioning=cond,
    )
    x = jax.random.normal(rng, (2, 6, 16, 12, 10, 4))
    cell_types = jnp.zeros((16, 12, 10), dtype=jnp.int32)
    params = model.init(rng, x, cell_types)
    y = model.apply(params, x, cell_types)
    assert y.shape == (2, 16, 12, 10, 4)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow


def test_geometry_embedding_path():
    # The geometry embedding's three VALID 5x5x5 convs (torch Conv3d default,
    # ddpm.py:383-389) need a near-real-scale grid: >= ~(45, 45, 45).
    rng = jax.random.PRNGKey(0)
    cond = Conditioning(cell_type_features=True, cell_type_embedding_dim=4)
    model = DenoisingModel(
        out_features=4,
        timesteps=10,
        dim=8,
        u_net_levels=1,
        conditioning=cond,
        with_geometry_embedding=True,
    )
    x = jax.random.normal(rng, (2, 50, 45, 45, 4))
    t = jnp.asarray([1, 2])
    cell_types = jnp.zeros((50, 45, 45), dtype=jnp.int32)
    params = model.init(rng, x, t, cell_types)
    y = model.apply(params, x, t, cell_types)
    assert y.shape == (2, 50, 45, 45, 4)
    assert np.all(np.isfinite(np.asarray(y)))
    # geometry embedding adds parameters
    assert any("geometry" in k.lower() for k in params["params"].keys())


def test_remat_equivalence():
    rng = jax.random.PRNGKey(0)
    kwargs = dict(out_features=4, timesteps=10, dim=8, u_net_levels=1)
    m1 = DenoisingModel(**kwargs, remat=False)
    m2 = DenoisingModel(**kwargs, remat=True)
    x = jax.random.normal(rng, (1, 8, 6, 6, 4))
    t = jnp.asarray([3])
    params = m1.init(rng, x, t)
    y1 = m1.apply(params, x, t)
    # same params: remat only changes the compilation, so outputs agree up
    # to float reassociation
    y2 = m2.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-3, atol=1e-5)

    g1 = jax.grad(lambda p: m1.apply(p, x, t).sum())(params)
    g2 = jax.grad(lambda p: m2.apply(p, x, t).sum())(params)
    l1 = jax.tree_util.tree_leaves(g1)[0]
    l2 = jax.tree_util.tree_leaves(g2)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-3, atol=1e-5)
