"""Shared Swin-transformer building blocks in Flax, NHWC-native.

TPU-first re-design of the reference's shared transformer machinery
(`/root/reference/xmm_superres_denoise/models/transformer/modules.py:24-602`,
`transformer/tools.py:34-67`):

  * NHWC throughout: window partition/reverse are pure reshape/transposes
    (tools.py:34-67 semantics) with no NCHW<->NLC layout churn — "patch
    embed/unembed" (modules.py:423-503) degenerate to a single reshape.
  * Relative-position bias indices and shifted-window masks are precomputed
    as numpy constants at module-construction time (static under jit),
    mirroring HAT's precomputed-RPI optimization (hat.py:689-692) across the
    whole zoo.
  * Attention runs as batched einsums over (B*nW, heads, N, d) — XLA maps
    these onto the MXU; window sizes (13^2=169 / 16^2=256 tokens) keep the
    matmuls dense and well-tiled.
  * torch-parity details: LayerNorm eps 1e-5, exact (erf) GELU, timm
    trunc_normal(std=0.02) linear init with zero bias (tools.py:24-31),
    torch-default conv init.

Effective-window rule (modules.py:232-238): when min(input_resolution) <=
window_size the window clamps to min(input_resolution) and shift drops to 0.
With the production configs (img 416, patch 32 -> input_resolution 13 < 16)
SwinIR/SwinFIR/DRCT thus run window 13, shift 0 — reproduced exactly, since
parameter shapes (bias tables) depend on it.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .rrdb import pixel_shuffle, torch_conv_init

Array = jnp.ndarray


# --------------------------------------------------------------------------- #
# Initializers (torch/timm parity)
# --------------------------------------------------------------------------- #

def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_: N(0, std) truncated at ABSOLUTE +-2 (timm's
    a=-2., b=2. defaults), i.e. +-100 sigma at std=0.02 — effectively an
    untruncated normal. Truncating at +-2*std (the naive reading) shrinks
    the effective std by ~12% vs the reference init."""

    def init(key, shape, dtype=jnp.float32):
        lim = 2.0 / std
        return std * jax.random.truncated_normal(key, -lim, lim, shape, dtype)

    return init


def dense_torch_init(
    name: Optional[str] = None, features: int = 0, use_bias: bool = True
):
    """nn.Dense with the reference's init_weights: trunc_normal(0.02) weight,
    zero bias (tools.py:24-28)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=trunc_normal_init(0.02),
        bias_init=nn.initializers.zeros_init(),
        name=name,
    )


# --------------------------------------------------------------------------- #
# Window geometry (static precomputation)
# --------------------------------------------------------------------------- #

def effective_window(
    input_resolution: Tuple[int, int], window_size: int, shift_size: int
) -> Tuple[int, int]:
    """Clamp rule of SwinTransformerBlock.__init__ (modules.py:232-238)."""
    if min(input_resolution) <= window_size:
        return min(input_resolution), 0
    return window_size, shift_size


def window_partition(x: Array, ws: int) -> Array:
    """(B, H, W, C) -> (B*nW, ws, ws, C), row-major windows (tools.py:34-48)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows: Array, ws: int, h: int, w: int) -> Array:
    """(B*nW, ws, ws, C) -> (B, H, W, C) (tools.py:51-67)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


@lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position bias index, (wh*ww, wh*ww) int32
    (modules.py:86-101)."""
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@lru_cache(maxsize=None)
def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """SW-MSA mask, (nW, N, N) float32 of {0, -100} (modules.py:268-297).

    Returns None for shift == 0 (the mask degenerates to all-zeros)."""
    if shift == 0:
        return None
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    mw = (
        img_mask.reshape(h // ws, ws, w // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# --------------------------------------------------------------------------- #
# Core modules
# --------------------------------------------------------------------------- #


class Mlp(nn.Module):
    """2-layer MLP with exact GELU (modules.py:24-47; torch nn.GELU = erf)."""

    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = dense_torch_init("fc1", self.hidden_features)(x)
        x = nn.gelu(x, approximate=False)
        x = dense_torch_init("fc2", self.out_features)(x)
        return x


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (modules.py:50-171).

    Input (B_, N, C) where B_ = B*nW and N = ws*ws; optional additive mask
    (nW, N, N) applied per image's window group. A fused Pallas attention
    core was prototyped in rounds 1-2 and removed: Mosaic could not lower it
    (value scatters; after rewriting to static ref stores, head_dim=30 lane
    slices crash the remote AOT compiler) and its realized gain was zero —
    see docs/PERFORMANCE.md "Pallas attention post-mortem".
    """

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        b_, n, c = x.shape
        nh = self.num_heads
        d = c // nh
        scale = d**-0.5

        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1), nh),
        )
        rpi = jnp.asarray(
            relative_position_index(self.window_size[0], self.window_size[1])
        )
        bias = bias_table[rpi.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)

        qkv_layer = (
            dense_torch_init("qkv", 3 * c)
            if self.qkv_bias
            else nn.Dense(
                3 * c, use_bias=False, kernel_init=trunc_normal_init(0.02),
                name="qkv",
            )
        )
        qkv = qkv_layer(x)  # (B_, N, 3C)

        qkv = qkv.reshape(b_, n, 3, nh, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, nh, N, d)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)

        return dense_torch_init("proj", c)(out)


def drop_path(
    x: Array, rate, deterministic: bool, rng: Optional[jax.Array]
) -> Array:
    """Stochastic depth (tools.py:6-21): per-sample binary residual dropout.

    `rate` may be a python float OR a traced scalar (the scan-compressed
    layer stacks feed per-group rates as scanned inputs) — only the static
    zero short-circuits."""
    if deterministic or rng is None:
        return x
    if isinstance(rate, float) and rate == 0.0:
        return x
    keep = 1.0 - jnp.asarray(rate, x.dtype)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
    return x / keep * mask


class SwinTransformerBlock(nn.Module):
    """Swin block: (S)W-MSA + MLP with residuals (modules.py:190-351).

    Operates on token form (B, L, C) with static spatial size `x_size`.
    The shifted-window mask is precomputed for `x_size` (not the config-time
    input_resolution) — equivalent to the reference's per-size
    `calculate_mask` fallback (modules.py:325-332) but free under jit.
    """

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_size: Tuple[int, int],
        deterministic: bool = True,
        rate_override: Optional[Array] = None,
    ) -> Array:
        h, w = x_size
        b, l, c = x.shape
        ws, shift = effective_window(
            self.input_resolution, self.window_size, self.shift_size
        )

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x.reshape(b, h, w, c)

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        xw = window_partition(x, ws).reshape(-1, ws * ws, c)
        mask_np = shifted_window_mask(h, w, ws, shift)
        mask = jnp.asarray(mask_np) if mask_np is not None else None
        attn = WindowAttention(
            c, (ws, ws), self.num_heads, self.qkv_bias, name="attn"
        )(xw, mask)
        attn = attn.reshape(-1, ws, ws, c)
        x = window_reverse(attn, ws, h, w)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, l, c)

        # rate_override: traced per-group rate from a scanned layer stack
        # (takes precedence over the static attribute)
        rate = (
            rate_override if rate_override is not None else self.drop_path_rate
        )
        use_dp = not deterministic and (
            rate_override is not None or self.drop_path_rate > 0.0
        )
        rng = self.make_rng("droppath") if use_dp else None
        x = shortcut + drop_path(x, rate, deterministic, rng)
        y = Mlp(int(c * self.mlp_ratio), c, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        rng2 = self.make_rng("droppath") if use_dp else None
        return x + drop_path(y, rate, deterministic, rng2)


class BasicLayer(nn.Module):
    """Stack of depth Swin blocks, alternating shift 0 / ws//2
    (modules.py:509-591)."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rates: Sequence[float] = ()
    use_checkpoint: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_size: Tuple[int, int],
        deterministic: bool = True,
        rates_override: Optional[Array] = None,
    ) -> Array:
        block_cls = (
            nn.remat(SwinTransformerBlock, static_argnums=(2, 3))
            if self.use_checkpoint
            else SwinTransformerBlock
        )
        for i in range(self.depth):
            dp = (
                self.drop_path_rates[i]
                if i < len(self.drop_path_rates)
                else 0.0
            )
            x = block_cls(
                dim=self.dim,
                input_resolution=self.input_resolution,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop_path_rate=dp,
                name=f"blocks_{i}",
            )(
                x,
                x_size,
                deterministic,
                None if rates_override is None else rates_override[i],
            )
        return x


def conv2d_torch(
    features: int, in_channels: int, kernel: int = 3, name: Optional[str] = None,
    use_bias: bool = True,
) -> nn.Conv:
    """nn.Conv with torch Conv2d default init and SAME padding."""
    w_init, b_init = torch_conv_init(in_channels, kernel)
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=w_init,
        bias_init=b_init,
        name=name,
    )


class UpsampleStack(nn.Module):
    """conv(nf->4nf) + PixelShuffle(2) per power of two (modules.py:374-395)."""

    scale: int
    num_feat: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if (self.scale & (self.scale - 1)) == 0:
            for i in range(int(math.log2(self.scale))):
                x = conv2d_torch(4 * self.num_feat, self.num_feat, name=f"conv_{i}")(x)
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = conv2d_torch(9 * self.num_feat, self.num_feat, name="conv_0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {self.scale} not supported (2^n or 3)")
        return x


class UpsampleOneStep(nn.Module):
    """Single conv + PixelShuffle(scale) (modules.py:398-415)."""

    scale: int
    num_feat: int
    num_out_ch: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = conv2d_torch(
            (self.scale**2) * self.num_out_ch, self.num_feat, name="conv"
        )(x)
        return pixel_shuffle(x, self.scale)


def to_tokens(x: Array) -> Array:
    """(B, H, W, C) -> (B, L, C). NHWC makes patch-embed a reshape
    (modules.py:457-461 without the NCHW transpose)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def to_image(x: Array, x_size: Tuple[int, int]) -> Array:
    """(B, L, C) -> (B, H, W, C) (modules.py:497-503)."""
    b, l, c = x.shape
    return x.reshape(b, x_size[0], x_size[1], c)
