"""RRDB/ESRGAN-style CNNs (SR generator + denoiser) in Flax, NHWC.

TPU-first re-design of the reference RRDB models
(`/root/reference/xmm_superres_denoise/models/modules/rrdb_blocks.py:22-70`,
`generator_rrdb.py:9-137`):

* NHWC layout + HWIO kernels — XLA's native TPU conv layout, so every 3x3
  conv tiles straight onto the MXU without layout transposes.
* PixelShuffle is a reshape/transpose pair (no gather), channel-order
  compatible with torch's `nn.PixelShuffle` so ONNX weights import 1:1.
* `memory_efficient` maps to `nn.remat` over whole RRDB blocks (the
  reference checkpoints the concats inside dense blocks, rrdb_blocks.py:40-47;
  rematerializing the full block is the XLA-friendly equivalent).
* Initializers replicate torch Conv2d defaults (kaiming-uniform a=sqrt(5) ==
  U(+-1/sqrt(fan_in)) with fan_in = in_ch*k*k) so from-scratch training matches
  the reference's statistical behavior, including the positive-bias init of
  `conv_last` (generator_rrdb.py:59-64).

Architecture semantics preserved exactly:
  dense block: 5 convs with LeakyReLU(0.2), dense concats, out*0.2 + x
  RRDB: 3 dense blocks, out*0.2 + x
  trunk: conv_first -> N x RRDB -> trunk_conv, skip add
  SR head: [conv(nf->4nf) -> LeakyReLU(0.01) -> PixelShuffle(2)] x num_upsample
           -> HRconv -> LeakyReLU(0.2) -> conv_last -> clamp
           (NOTE: the upsampling LeakyReLU uses torch's default slope 0.01 —
            generator_rrdb.py:96 `nn.LeakyReLU(inplace=True)`)
  DN head: conv_last + input skip -> clamp
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


def torch_conv_init(in_channels: int, kernel_size: int = 3):
    """Weight/bias initializers matching torch Conv2d defaults."""
    fan_in = in_channels * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)

    def w_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return w_init, w_init  # bias uses the same bound in torch


def positive_bias_init(in_channels: int, offset_std: float = 0.01):
    """conv_last init: U(-stdv, stdv + offset*stdv), stdv = 1/sqrt(in_ch).

    The reference biases the final conv positive because the output is clamped
    at 0 (generator_rrdb.py:56-64). Note its stdv uses in_channels only (not
    the kernel taps) — reproduced as-is.
    """
    stdv = 1.0 / math.sqrt(in_channels)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv + offset_std * stdv)

    return init


def conv3x3(features: int, in_channels: int, name: str | None = None) -> nn.Conv:
    w_init, b_init = torch_conv_init(in_channels)
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding="SAME",
        kernel_init=w_init,
        bias_init=b_init,
        name=name,
    )


def lrelu(x: Array, slope: float = 0.2) -> Array:
    return nn.leaky_relu(x, negative_slope=slope)


def pixel_shuffle(x: Array, r: int = 2) -> Array:
    """torch-channel-order PixelShuffle for NHWC tensors.

    out[n, h*r+i, w*r+j, c] = in[n, h, w, c*r*r + i*r + j]
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


def pixel_unshuffle(x: Array, r: int = 2) -> Array:
    """Inverse of :func:`pixel_shuffle` (used by Restormer's downsampling)."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, i, j
    return x.reshape(n, h, w, c * r * r)


class ResidualDenseBlock5C(nn.Module):
    """5-conv dense block with 0.2-scaled residual (rrdb_blocks.py:22-54)."""

    nf: int
    gc: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nf, gc = self.nf, self.gc
        x1 = lrelu(conv3x3(gc, nf, "conv1")(x))
        x2 = lrelu(conv3x3(gc, nf + gc, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = lrelu(conv3x3(gc, nf + 2 * gc, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(
            conv3x3(gc, nf + 3 * gc, "conv4")(jnp.concatenate([x, x1, x2, x3], -1))
        )
        x5 = conv3x3(nf, nf + 4 * gc, "conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1)
        )
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (rrdb_blocks.py:57-70)."""

    nf: int
    gc: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB3")(out)
        return out * 0.2 + x


class _RRDBTrunk(nn.Module):
    """conv_first -> N x RRDB -> trunk_conv with long skip (generator_rrdb.py:66-69)."""

    in_channels: int
    num_filters: int
    num_res_blocks: int
    memory_efficient: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nf = self.num_filters
        fea = conv3x3(nf, self.in_channels, "conv_first")(x)
        block_cls = nn.remat(RRDB) if self.memory_efficient else RRDB
        t = fea
        for i in range(self.num_res_blocks):
            t = block_cls(nf, nf, name=f"rrdb_{i}")(t)
        trunk = conv3x3(nf, nf, "trunk_conv")(t)
        return fea + trunk


class GeneratorRRDB_SR(nn.Module):
    """2x-per-stage super-resolution generator (generator_rrdb.py:72-110)."""

    in_channels: int = 1
    out_channels: int = 1
    num_filters: int = 32
    num_res_blocks: int = 4
    num_upsample: int = 1
    memory_efficient: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nf = self.num_filters
        fea = _RRDBTrunk(
            self.in_channels,
            nf,
            self.num_res_blocks,
            self.memory_efficient,
            name="trunk",
        )(x)
        for i in range(self.num_upsample):
            fea = conv3x3(nf * 4, nf, f"upconv_{i}")(fea)
            fea = lrelu(fea, slope=0.01)  # torch default slope here, see docstring
            fea = pixel_shuffle(fea, 2)
        fea = conv3x3(nf, nf, "HRconv")(fea)
        fea = lrelu(fea, slope=0.2)
        out = nn.Conv(
            self.out_channels,
            (3, 3),
            padding="SAME",
            kernel_init=positive_bias_init(nf),
            bias_init=positive_bias_init(nf),
            name="conv_last",
        )(fea)
        return jnp.clip(out, 0.0, 1.0)


class GeneratorRRDB_DN(nn.Module):
    """Same-resolution denoiser with input skip (generator_rrdb.py:113-137)."""

    in_channels: int = 1
    out_channels: int = 1
    num_filters: int = 32
    num_res_blocks: int = 4
    memory_efficient: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nf = self.num_filters
        fea = _RRDBTrunk(
            self.in_channels,
            nf,
            self.num_res_blocks,
            self.memory_efficient,
            name="trunk",
        )(x)
        out = nn.Conv(
            self.out_channels,
            (3, 3),
            padding="SAME",
            kernel_init=positive_bias_init(nf),
            bias_init=positive_bias_init(nf),
            name="conv_last",
        )(fea)
        out = out + x
        return jnp.clip(out, 0.0, 1.0)
