"""Building blocks of the denoising U-Net (flax.linen, channels-last).

Design notes (TPU-first):
- 3D convs run in NDHWC layout, XLA's native TPU conv layout.
- Replicate ("edge") padding + VALID conv reproduces the reference's
  ``padding_mode="replicate"`` (``turbdiff/models/ddpm.py:154-177``).
- Down/upsampling uses the MXU-friendly align-corners trilinear resize from
  ``ops.interp`` with the floor-at-3 rule (``ddpm.py:351-372``).
- The ResnetBlock core can run as one Pallas flat-layout chain (opt-in
  GT_FUSED_BLOCKS=1; measured slower than XLA's in-context conv fusion at
  the shapes workload — see ops/pallas_kernels.py status notes).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import efficient_linear_attention, multihead_attention
from ..ops.interp import downsample_size, resize_trilinear
from ..ops.pallas_kernels import (
    fused_block_applicable,
    fused_double_conv_block,
)

ActFn = Callable[[jnp.ndarray], jnp.ndarray]


def replicate_pad3d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-pad the three spatial axes of (..., X, Y, Z, C)."""
    cfg = [(0, 0)] * (x.ndim - 4) + [(pad, pad)] * 3 + [(0, 0)]
    return jnp.pad(x, cfg, mode="edge")


class Conv3d(nn.Module):
    """3x3x3 (or kxkxk) conv with replicate padding; 1x1x1 convs skip padding.

    ``mxu_pad``: zero-pad the kernel's channel dims to this multiple at apply
    time (bit-identical outputs; parameters stay at their logical shapes).
    An ISOLATED sub-128-channel conv is 2.6-3x slower than its zero-padded
    equivalent on TPU, but inside the full U-Net graph XLA already picks
    efficient strategies and padding showed no end-to-end gain — so this is
    OFF by default and kept as a tuning knob for other architectures.
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    mxu_pad: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, k, c_in, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        pad = (k - 1) // 2 * self.dilation
        if pad > 0:
            x = replicate_pad3d(x, pad)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)

        out_pad = 0
        m = self.mxu_pad
        if m and k > 1:
            if self.features < m:
                out_pad = m - self.features
                kernel = jnp.pad(kernel, ((0, 0),) * 4 + ((0, out_pad),))
            elif c_in < m:
                in_pad = m - c_in
                x = jnp.pad(x, ((0, 0),) * 4 + ((0, in_pad),))
                kernel = jnp.pad(kernel, ((0, 0),) * 3 + ((0, in_pad), (0, 0)))
            if out_pad or c_in < m:
                # Keep XLA's simplifier from folding the zero-padding back
                # into a narrow (slow-path) convolution.
                kernel = jax.lax.optimization_barrier(kernel)

        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1, 1),
            padding="VALID",
            rhs_dilation=(self.dilation,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if out_pad:
            y = y[..., : self.features]
        if bias is not None:
            y = y + (bias.astype(y.dtype) if self.dtype is not None else bias)
        return y


def make_norm(norm_type: str, dtype=None) -> Callable[[], nn.Module]:
    """Norm factory mirroring the reference mapping (``ddpm.py:424-431``):
    instance -> GroupNorm(C groups), layer -> GroupNorm(1), group -> GroupNorm(8)."""
    # epsilon matches torch.nn.GroupNorm's default (1e-5; flax defaults to
    # 1e-6) so imported reference checkpoints reproduce bit-comparable stats.
    if norm_type == "instance":
        return lambda name=None: nn.GroupNorm(
            num_groups=None, group_size=1, epsilon=1e-5, dtype=dtype, name=name
        )
    if norm_type == "layer":
        return lambda name=None: nn.GroupNorm(
            num_groups=1, epsilon=1e-5, dtype=dtype, name=name
        )
    if norm_type == "group":
        return lambda name=None: nn.GroupNorm(
            num_groups=8, epsilon=1e-5, dtype=dtype, name=name
        )
    raise ValueError(f"Unknown norm type {norm_type!r}")


class ConvBlock(nn.Module):
    """conv3x3 -> norm -> optional FiLM ((scale+1) * x + shift) -> act."""

    features: int
    actfn: ActFn
    norm_type: str = "group"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.conv = Conv3d(self.features, 3, dtype=self.dtype)
        self.norm = make_norm(self.norm_type, dtype=self.dtype)()

    def __call__(
        self,
        x: jnp.ndarray,
        scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        x = self.conv(x)
        x = self.norm(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            # FiLM vectors are (B, C); broadcast over the spatial axes.
            scale = scale[:, None, None, None, :]
            shift = shift[:, None, None, None, :]
            x = (scale + 1.0) * x + shift
        return self.actfn(x)

    def fused_params(self, c_in: int):
        """Expose (kernel, bias, gamma, beta) for the fused Pallas chain.

        Dummy calls materialize/bind the child params without touching real
        activations (27 voxels; XLA removes the dead compute)."""
        dummy = jnp.zeros((1, 3, 3, 3, c_in), self.dtype or jnp.float32)
        self.norm(self.conv(dummy))
        cv = self.conv.variables["params"]
        nv = self.norm.variables["params"]
        return cv["kernel"], cv["bias"], nv["scale"], nv["bias"]


class ResnetBlock(nn.Module):
    """Two conv blocks with FiLM conditioning on the first + 1x1 skip
    (``ddpm.py:180-197``).

    With GT_FUSED_BLOCKS=1 the two ConvBlocks run as one Pallas flat-layout
    chain at the full-resolution levels (``fused_double_conv_block``), which
    keeps activations in the conv kernel's padded-flat layout between the
    convs.  Measured end-to-end it currently loses to XLA's in-context conv
    fusion (bf16 fwd 40.4 -> 36.9 samples/min), so it ships opt-in."""

    features: int
    actfn: ActFn
    norm_type: str = "group"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.film = nn.Dense(2 * self.features, dtype=self.dtype)
        self.block1 = ConvBlock(self.features, self.actfn, self.norm_type, self.dtype)
        self.block2 = ConvBlock(self.features, self.actfn, self.norm_type, self.dtype)
        self.skip = nn.Conv(self.features, kernel_size=(1, 1, 1), dtype=self.dtype)

    def _num_groups(self, channels: int) -> int:
        return {"group": 8, "layer": 1, "instance": channels}[self.norm_type]

    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        scale_shift = None
        if c is not None:
            proj = self.film(c)
            scale_shift = jnp.split(proj, 2, axis=-1)

        use_fused = (
            not self.is_initializing()
            and self.actfn is nn.silu
            and fused_block_applicable(x, x.shape[-1], self.features)
        )
        if use_fused:
            k1, b1, g1, be1 = self.block1.fused_params(x.shape[-1])
            k2, b2, g2, be2 = self.block2.fused_params(self.features)
            scale, shift = scale_shift if scale_shift is not None else (None, None)
            h = fused_double_conv_block(
                x, k1, b1, g1, be1, scale, shift, k2, b2, g2, be2,
                self._num_groups(self.features), 1e-5,
            )
        else:
            h = self.block1(x, scale_shift)
            h = self.block2(h)

        if x.shape[-1] != self.features:
            x = self.skip(x)
        return h + x


class VoxelAttention(nn.Module):
    """Full self-attention over all voxels (used at the U-Net bottleneck,
    ``ddpm.py:286-308``).  kind: "full" | "linear" | "local"."""

    heads: int = 4
    dim_head: int = 32
    kind: str = "full"
    window_size: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, X, Y, Z, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(
            3 * hidden,
            kernel_size=(1, 1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="to_qkv",
        )(x)

        if self.kind == "local":
            out = self._local(qkv, (X, Y, Z))
        else:
            tokens = qkv.reshape(B, X * Y * Z, 3, self.heads, self.dim_head)
            q, k, v = (
                tokens[:, :, 0].transpose(0, 2, 1, 3),
                tokens[:, :, 1].transpose(0, 2, 1, 3),
                tokens[:, :, 2].transpose(0, 2, 1, 3),
            )
            if self.kind == "full":
                out = multihead_attention(q, k, v)
            elif self.kind == "linear":
                out = efficient_linear_attention(q, k, v)
            else:
                raise ValueError(f"Unknown attention kind {self.kind!r}")
            out = out.transpose(0, 2, 1, 3).reshape(B, X, Y, Z, hidden)

        return nn.Conv(C, kernel_size=(1, 1, 1), dtype=self.dtype, name="to_out")(out)

    def _local(self, qkv: jnp.ndarray, spatial: Tuple[int, int, int]) -> jnp.ndarray:
        """Windowed attention with constant padding to a window multiple
        (``ddpm.py:232-283``)."""
        B = qkv.shape[0]
        w = self.window_size
        X, Y, Z = spatial
        pads = [(-s) % w for s in spatial]
        if any(pads):
            cfg = [(0, 0)] + [(0, p) for p in pads] + [(0, 0)]
            qkv = jnp.pad(qkv, cfg)  # constant 0: softens padded-cell softmax weight
        Xp, Yp, Zp = (s + p for s, p in zip(spatial, pads))
        nx, ny, nz = Xp // w, Yp // w, Zp // w

        t = qkv.reshape(B, nx, w, ny, w, nz, w, 3, self.heads, self.dim_head)
        # -> (B*nwin, heads, w^3, dim_head) per q/k/v
        t = t.transpose(0, 1, 3, 5, 7, 8, 2, 4, 6, 9)
        t = t.reshape(B * nx * ny * nz, 3, self.heads, w**3, self.dim_head)
        out = multihead_attention(t[:, 0], t[:, 1], t[:, 2])
        out = out.reshape(B, nx, ny, nz, self.heads, w, w, w, self.dim_head)
        out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4, 8)
        out = out.reshape(B, Xp, Yp, Zp, self.heads * self.dim_head)
        return out[:, :X, :Y, :Z]


class UNet(nn.Module):
    """Interpolation U-Net over arbitrary (non-power-of-two) grids.

    Downsampling halves each axis with a floor of 3; upsampling resizes to the
    exact skip shape, so any input resolution round-trips (``ddpm.py:326-372``).
    The center block is resnet -> prenorm-residual attention -> resnet.
    """

    dim: int
    levels: int
    actfn: ActFn
    norm_type: str = "group"
    attention_kind: str = "full"
    remat: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # Rematerialize ResnetBlocks during training: the level-0 activations
        # at the shapes grid are ~750 MB each, and saving them all for the
        # backward pass exceeds a v5e's HBM at the reference batch size.
        block_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        block = lambda feats, name: block_cls(  # noqa: E731
            feats, self.actfn, self.norm_type, self.dtype, name=name
        )

        skips = []
        for i in range(self.levels):
            x = block(self.dim * 2 ** (i + 1), f"down_{i}")(x, c)
            skips.append(x)
            x = resize_trilinear(x, downsample_size(x.shape[-4:-1]))

        center_dim = self.dim * 2**self.levels
        x = block(center_dim, "center_in")(x, c)
        h = make_norm(self.norm_type, dtype=self.dtype)(name="center_norm")(x)
        x = x + VoxelAttention(kind=self.attention_kind, dtype=self.dtype, name="center_attention")(h)
        x = block(center_dim, "center_out")(x, c)

        for i in reversed(range(self.levels)):
            skip = skips.pop()
            x = resize_trilinear(x, skip.shape[-4:-1])
            x = block(self.dim * 2**i, f"up_{i}")(
                jnp.concatenate([x, skip], axis=-1), c
            )

        return x
