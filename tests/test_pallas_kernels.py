"""Pallas kernels vs reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_turbulence_tpu.ops.attention import _xla_attention
from generative_turbulence_tpu.ops.pallas_kernels import (
    flash_attention,
    groupnorm_film_silu,
    _unfused_gn_film_silu,
)


class TestFlashAttention:
    @pytest.mark.parametrize("n", [64, 256, 300])
    def test_matches_xla(self, n):
        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        B, H, D = 2, 2, 32
        q = jax.random.normal(kq, (B, H, n, D))
        k = jax.random.normal(kk, (B, H, n, D))
        v = jax.random.normal(kv, (B, H, n, D))

        ours = flash_attention(q, k, v, block_q=64, block_k=64)
        ref = _xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_padded_tokens_do_not_leak(self):
        # n = 100 with blocks of 64 pads to 192; padded keys must get zero
        # weight, so the result matches the exact XLA attention.
        rng = jax.random.PRNGKey(1)
        q = jax.random.normal(rng, (1, 1, 100, 16))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 1, 100, 16))
        v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 1, 100, 16))
        ours = flash_attention(q, k, v, block_q=64, block_k=64)
        ref = _xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=2e-5)


class TestFusedGroupNorm:
    def test_matches_unfused(self):
        rng = jax.random.PRNGKey(0)
        B, X, Y, Z, C = 2, 6, 5, 4, 16
        G = 8
        x = jax.random.normal(rng, (B, X, Y, Z, C))
        gamma = jax.random.normal(jax.random.fold_in(rng, 1), (C,)) * 0.1 + 1
        beta = jax.random.normal(jax.random.fold_in(rng, 2), (C,)) * 0.1
        scale = jax.random.normal(jax.random.fold_in(rng, 3), (B, C)) * 0.1
        shift = jax.random.normal(jax.random.fold_in(rng, 4), (B, C)) * 0.1

        fused = groupnorm_film_silu(x, gamma, beta, scale, shift, num_groups=G)
        ref = _unfused_gn_film_silu(x, gamma, beta, scale, shift, G, 1e-5)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_no_film(self):
        rng = jax.random.PRNGKey(5)
        x = jax.random.normal(rng, (1, 4, 4, 4, 8))
        gamma = jnp.ones(8)
        beta = jnp.zeros(8)
        out = groupnorm_film_silu(x, gamma, beta, None, None, num_groups=4)
        # silu(groupnorm(x)): group means ~0 after norm
        assert np.all(np.isfinite(np.asarray(out)))

    def test_matches_flax_groupnorm(self):
        import flax.linen as nn

        rng = jax.random.PRNGKey(0)
        B, X, Y, Z, C = 2, 5, 4, 3, 16
        x = jax.random.normal(rng, (B, X, Y, Z, C))
        gn = nn.GroupNorm(num_groups=8)
        params = gn.init(rng, x)
        gamma = params["params"]["scale"]
        beta = params["params"]["bias"]

        expect = jax.nn.silu(gn.apply(params, x))
        ours = groupnorm_film_silu(x, gamma, beta, None, None, num_groups=8)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(expect), rtol=1e-4, atol=1e-5)

    def test_large_slab_fallback(self):
        # Slab beyond the VMEM budget silently takes the unfused path.
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, 64, 64, 64, 64))  # slab = 64^3*8*4B = 8.4MB
        gamma, beta = jnp.ones(64), jnp.zeros(64)
        out = groupnorm_film_silu(x, gamma, beta, None, None, num_groups=8)
        assert out.shape == x.shape


class TestPallasConv3d:
    @pytest.mark.parametrize("shape,cin,cout", [((5, 7, 6), 4, 8), ((6, 10, 13), 12, 16)])
    def test_matches_xla_conv(self, shape, cin, cout):
        from generative_turbulence_tpu.ops.pallas_kernels import (
            conv3d_3x3,
            _conv3d_3x3_xla,
        )

        rng = jax.random.PRNGKey(0)
        kx, kw, kb = jax.random.split(rng, 3)
        x = jax.random.normal(kx, (2, *shape, cin), dtype=jnp.float32)
        w = jax.random.normal(kw, (3, 3, 3, cin, cout), dtype=jnp.float32) * 0.1
        b = jax.random.normal(kb, (cout,), dtype=jnp.float32)

        ours = conv3d_3x3(x, w, b)
        ref = _conv3d_3x3_xla(x, w, b)
        assert ours.shape == ref.shape == (2, *shape, cout)
        # bf16 operands with f32 accumulation: bf16-level tolerance.
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=3e-2, atol=3e-2
        )

    def test_gradients_flow(self):
        from generative_turbulence_tpu.ops.pallas_kernels import (
            conv3d_3x3,
            _conv3d_3x3_xla,
        )

        rng = jax.random.PRNGKey(1)
        kx, kw = jax.random.split(rng)
        x = jax.random.normal(kx, (1, 4, 5, 6, 3))
        w = jax.random.normal(kw, (3, 3, 3, 3, 4)) * 0.1
        b = jnp.zeros((4,))

        g_ours = jax.grad(lambda x, w, b: conv3d_3x3(x, w, b).sum(), argnums=(0, 1, 2))(x, w, b)
        g_ref = jax.grad(lambda x, w, b: _conv3d_3x3_xla(x, w, b).sum(), argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-5)

    def test_dispatch_envelope(self):
        from generative_turbulence_tpu.ops.pallas_kernels import (
            conv3d_3x3_dispatch,
            pallas_available,
        )

        x = jnp.zeros((1, 64, 24, 24, 8))
        w = jnp.zeros((3, 3, 3, 8, 8))
        out = conv3d_3x3_dispatch(x, w, None, enabled=True)
        if pallas_available():
            assert out is not None
        else:
            assert out is None  # CPU: model falls back to the XLA path
        # Too small a grid: always None.
        assert conv3d_3x3_dispatch(jnp.zeros((1, 8, 8, 8, 8)), w, None, enabled=True) is None
        # Ships off by default: the kernel loses end-to-end in the model.
        assert conv3d_3x3_dispatch(x, w, None) is None
