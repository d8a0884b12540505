"""TF-Net baseline generalized to 3D (turbulent-flow net).

Decomposes the context window u = u_bar + u_tilde + u_prime via a learned
spatial filter (conv3d k=3, no bias) and a learned temporal filter over a
sliding window, encodes each component with a strided conv encoder
(64->128->256->512), sums encoder features per scale, and decodes with
transposed convs + shape clipping.  Semantics follow
``turbdiff/models/tfnet.py:261-368``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .conditioning import Conditioning


def _clip_to(a: jnp.ndarray, shape3: Tuple[int, int, int]) -> jnp.ndarray:
    return a[..., : shape3[0], : shape3[1], : shape3[2], :]


class _Encoder(nn.Module):
    kernel_size: int = 3
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c_local: Optional[jnp.ndarray],
        deterministic: bool = True,
    ):
        def conv(features, stride, name):
            def apply(h):
                h = nn.Conv(
                    features,
                    (self.kernel_size,) * 3,
                    strides=(stride,) * 3,
                    padding="SAME",
                    dtype=self.dtype,
                    name=name,
                )(h)
                h = nn.BatchNorm(
                    use_running_average=True, dtype=self.dtype, name=f"{name}_bn"
                )(h)
                h = nn.leaky_relu(h, 0.1)
                if self.dropout_rate > 0:
                    h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
                return h

            return apply

        out1 = conv(64, 2, "conv1")(x)
        if c_local is not None:
            out1 = out1 + conv(64, 2, "conv1_local")(c_local[None])
        out2 = conv(128, 2, "conv2")(out1)
        out3 = conv(256, 2, "conv3")(out2)
        out4 = conv(512, 2, "conv4")(out3)
        return out1, out2, out3, out4


class _Deconv(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.features, (4, 4, 4), strides=(2, 2, 2), padding="SAME", dtype=self.dtype
        )(x)
        return nn.leaky_relu(x, 0.1)


class TFNet(nn.Module):
    n_features: int
    context_window: int = 6
    temporal_filtering_length: int = 4
    kernel_size: int = 3
    dropout_rate: float = 0.0
    conditioning: Optional[Conditioning] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xx: jnp.ndarray,
        cell_types: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """xx: (B, T, X, Y, Z, F) context -> (B, X, Y, Z, F) next-step prediction."""
        B, T, X, Y, Z, F = xx.shape

        c_local = None
        if self.conditioning is not None and cell_types is not None:
            c_local = self.conditioning(cell_types)

        # 1. Learned spatial filter applied per (frame, channel): move channels
        # into the batch so one single-channel filter convolves each field.
        flat = xx.transpose(0, 1, 5, 2, 3, 4).reshape(B * T * F, X, Y, Z, 1)
        u_star = nn.Conv(
            1,
            (self.kernel_size,) * 3,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="spatial_filter",
        )(flat)
        u_star = u_star.reshape(B, T, F, X, Y, Z).transpose(0, 1, 3, 4, 5, 2)

        # 2. Residual after spatial filtering.
        u_prime = xx - u_star

        # 3. Learned temporal filter over sliding windows of length L.
        L = self.temporal_filtering_length
        n_windows = T - L + 1
        # windows: (B, n_windows, L, X, Y, Z, F)
        windows = jnp.stack([u_star[:, i : i + L] for i in range(n_windows)], axis=1)
        w = self.param(
            "temporal_filter", nn.initializers.lecun_normal(), (L, 1), jnp.float32
        )
        u_bar = jnp.einsum("bnlxyzf,lo->bnxyzf", windows, w.astype(windows.dtype))

        # 4. Residual after temporal filtering; align window counts.
        u_tilde = u_star[:, -n_windows:] - u_bar
        u_prime = u_prime[:, -n_windows:]

        def stack_time(u):  # (B, n, X, Y, Z, F) -> (B, X, Y, Z, n*F)
            return u.transpose(0, 2, 3, 4, 1, 5).reshape(B, X, Y, Z, n_windows * F)

        enc = lambda name: _Encoder(  # noqa: E731
            self.kernel_size, self.dropout_rate, self.dtype, name=name
        )
        outs_bar = enc("encoder_bar")(stack_time(u_bar), c_local, deterministic)
        outs_tilde = enc("encoder_tilde")(stack_time(u_tilde), c_local, deterministic)
        outs_prime = enc("encoder_prime")(stack_time(u_prime), c_local, deterministic)
        sums = [a + b + c for a, b, c in zip(outs_bar, outs_tilde, outs_prime)]
        out1, out2, out3, out4 = sums

        d3 = _Deconv(256, self.dtype)(out4)
        d2 = _Deconv(128, self.dtype)(out3 + _clip_to(d3, out3.shape[-4:-1]))
        d1 = _Deconv(64, self.dtype)(out2 + _clip_to(d2, out2.shape[-4:-1]))
        d0 = _Deconv(32, self.dtype)(out1 + _clip_to(d1, out1.shape[-4:-1]))
        out = nn.Conv(
            self.n_features,
            (self.kernel_size,) * 3,
            padding="SAME",
            dtype=jnp.float32,
            name="output_layer",
        )(_clip_to(d0, (X, Y, Z)).astype(jnp.float32))
        return out
