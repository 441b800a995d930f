"""Restormer (MDTA + GDFN U-Net) in Flax, NHWC.

Re-implements `/root/reference/xmm_superres_denoise/models/transformer/restormer.py`:

  * MDTA: transposed (channel) attention — q/k/v from 1x1 conv + 3x3
    depthwise conv, L2-normalized over the spatial axis, attention is
    (c x c) per head with a learned per-head temperature
    (restormer.py:106-147). Linear in pixels — the d x d matmuls batch
    cleanly onto the MXU.
  * GDFN: gated depthwise feed-forward (restormer.py:76-101).
  * LayerNorm over channels at each pixel ('WithBias', eps 1e-5, biased
    variance — restormer.py:42-58), applied directly on NHWC (the
    reference's to_3d/to_4d rearrange dance is layout-free here).
  * 4-level U-Net with pixel-(un)shuffle resizing, skip concats, channel
    reducers, refinement, and a global input residual (restormer.py:217-406).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .rrdb import pixel_shuffle, pixel_unshuffle
from .swin_common import conv2d_torch

Array = jnp.ndarray


class ChannelLayerNorm(nn.Module):
    """Per-pixel LayerNorm over the channel axis (restormer.py:42-58).

    eps inside sqrt, biased variance; with_bias selects the reference's
    'WithBias' (mean-subtracting) vs 'BiasFree' variant."""

    dim: int
    with_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param("weight", nn.initializers.ones_init(), (self.dim,))
        if self.with_bias:
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            y = (x - mu) / jnp.sqrt(var + 1e-5) * weight
            bias = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
            return y + bias
        var = jnp.var(x, axis=-1, keepdims=True)
        return x / jnp.sqrt(var + 1e-5) * weight


def depthwise_conv3x3(features: int, name: str, use_bias: bool) -> nn.Conv:
    from .rrdb import torch_conv_init

    # torch depthwise fan_in = (in_ch/groups)*k*k = 9
    w_init, b_init = torch_conv_init(1, 3)
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding="SAME",
        feature_group_count=features,
        use_bias=use_bias,
        kernel_init=w_init,
        bias_init=b_init,
        name=name,
    )


class MDTA(nn.Module):
    """Multi-DConv-head transposed attention (restormer.py:106-147)."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        nh = self.num_heads
        d = c // nh
        temperature = self.param(
            "temperature", nn.initializers.ones_init(), (nh, 1, 1)
        )
        qkv = conv2d_torch(3 * c, c, kernel=1, use_bias=self.use_bias, name="qkv")(x)
        qkv = depthwise_conv3x3(3 * c, "qkv_dwconv", self.use_bias)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # (b, heads, d, hw): channels as rows, pixels as the contracted axis
        def heads_first(t):
            return t.reshape(b, h * w, nh, d).transpose(0, 2, 3, 1)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        attn = jnp.einsum(
            "bhdn,bhen->bhde", q, k, preferred_element_type=jnp.float32
        ) * temperature
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return conv2d_torch(c, c, kernel=1, use_bias=self.use_bias, name="project_out")(
            out
        )


class GDFN(nn.Module):
    """Gated-DConv feed-forward (restormer.py:76-101)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = int(self.dim * self.expansion)
        x = conv2d_torch(
            2 * hidden, self.dim, kernel=1, use_bias=self.use_bias, name="project_in"
        )(x)
        x = depthwise_conv3x3(2 * hidden, "dwconv", self.use_bias)(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = nn.gelu(x1, approximate=False) * x2
        return conv2d_torch(
            self.dim, hidden, kernel=1, use_bias=self.use_bias, name="project_out"
        )(x)


class RestormerBlock(nn.Module):
    """LN -> MDTA residual, LN -> GDFN residual (restormer.py:151-164)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x + MDTA(self.dim, self.num_heads, self.use_bias, name="attn")(
            ChannelLayerNorm(self.dim, name="norm1")(x)
        )
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn")(
            ChannelLayerNorm(self.dim, name="norm2")(x)
        )
        return x


class Downsample(nn.Module):
    """conv(c -> c/2) + PixelUnshuffle(2): halves res, doubles channels
    (restormer.py:185-197)."""

    n_feat: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = conv2d_torch(self.n_feat // 2, self.n_feat, use_bias=False, name="body")(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """conv(c -> 2c) + PixelShuffle(2): doubles res, halves channels
    (restormer.py:200-212)."""

    n_feat: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = conv2d_torch(self.n_feat * 2, self.n_feat, use_bias=False, name="body")(x)
        return pixel_shuffle(x, 2)


class Restormer(nn.Module):
    """4-level encoder/decoder with refinement (restormer.py:217-406)."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dim

        def blocks(n: int, dim: int, heads: int, name: str):
            def run(t):
                for i in range(n):
                    t = RestormerBlock(
                        dim, heads, self.ffn_expansion_factor, self.use_bias,
                        name=f"{name}_{i}",
                    )(t)
                return t

            return run

        inp1 = conv2d_torch(d, self.inp_channels, use_bias=False, name="patch_embed")(x)
        enc1 = blocks(self.num_blocks[0], d, self.heads[0], "encoder_level1")(inp1)

        inp2 = Downsample(d, name="down1_2")(enc1)
        enc2 = blocks(self.num_blocks[1], d * 2, self.heads[1], "encoder_level2")(inp2)

        inp3 = Downsample(d * 2, name="down2_3")(enc2)
        enc3 = blocks(self.num_blocks[2], d * 4, self.heads[2], "encoder_level3")(inp3)

        inp4 = Downsample(d * 4, name="down3_4")(enc3)
        latent = blocks(self.num_blocks[3], d * 8, self.heads[3], "latent")(inp4)

        dec3_in = Upsample(d * 8, name="up4_3")(latent)
        dec3_in = jnp.concatenate([dec3_in, enc3], axis=-1)
        dec3_in = conv2d_torch(
            d * 4, d * 8, kernel=1, use_bias=self.use_bias, name="reduce_chan_level3"
        )(dec3_in)
        dec3 = blocks(self.num_blocks[2], d * 4, self.heads[2], "decoder_level3")(
            dec3_in
        )

        dec2_in = Upsample(d * 4, name="up3_2")(dec3)
        dec2_in = jnp.concatenate([dec2_in, enc2], axis=-1)
        dec2_in = conv2d_torch(
            d * 2, d * 4, kernel=1, use_bias=self.use_bias, name="reduce_chan_level2"
        )(dec2_in)
        dec2 = blocks(self.num_blocks[1], d * 2, self.heads[1], "decoder_level2")(
            dec2_in
        )

        dec1_in = Upsample(d * 2, name="up2_1")(dec2)
        dec1_in = jnp.concatenate([dec1_in, enc1], axis=-1)
        dec1 = blocks(self.num_blocks[0], d * 2, self.heads[0], "decoder_level1")(
            dec1_in
        )

        out = blocks(self.num_refinement_blocks, d * 2, self.heads[0], "refinement")(
            dec1
        )
        out = conv2d_torch(
            self.out_channels, d * 2, use_bias=self.use_bias, name="output"
        )(out)
        return out + x
