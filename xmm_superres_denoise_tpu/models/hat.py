"""HAT (Hybrid Attention Transformer) in Flax, NHWC.

Re-implements `/root/reference/xmm_superres_denoise/models/transformer/hat.py`:

  * CAB: conv-GELU-conv + RCAN channel attention (hat.py:10-44); global
    average pool + 1x1 squeeze/excite — pure jnp reductions.
  * HAB: window attention + parallel CAB branch scaled by conv_scale=0.01,
    then MLP (hat.py:141-271).
  * OCAB: overlapping cross-attention — queries from non-overlapping ws
    windows, keys/values from (ws + overlap) windows extracted by an
    unfold. TPU-native: the unfold is a window_partition over a zero-padded
    image plus concatenation of shifted views — implemented here as
    jax.lax.conv_general_dilated_patches-free reshape/slice stack so XLA
    sees static slices, not gathers (hat.py:274-396).
  * RHAG: depth x HAB + 1 OCAB + residual conv (hat.py:399-611).

Relative-position indices for both attention types are precomputed numpy
constants (hat.py:689-692, 787-834). The production config (img 416,
patch 16 -> input_resolution 26 > window 16) keeps window 16 WITH shifted
windows, unlike the other zoo members.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .swin_common import (
    Mlp,
    UpsampleStack,
    conv2d_torch,
    dense_torch_init,
    drop_path,
    effective_window,
    relative_position_index,
    shifted_window_mask,
    to_image,
    to_tokens,
    trunc_normal_init,
    window_partition,
    window_reverse,
)

Array = jnp.ndarray


@lru_cache(maxsize=None)
def rpi_oca(window_size: int, overlap_ratio: float) -> np.ndarray:
    """Relative-position index between ws and ws+overlap windows
    (hat.py:805-834)."""
    ws = window_size
    wse = ws + int(overlap_ratio * ws)
    coords_ori = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    coords_ext = np.stack(
        np.meshgrid(np.arange(wse), np.arange(wse), indexing="ij")
    ).reshape(2, -1)
    rel = coords_ext[:, None, :] - coords_ori[:, :, None]  # 2, ws*ws, wse*wse
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - wse + 1
    rel[:, :, 1] += ws - wse + 1
    rel[:, :, 0] *= ws + wse - 1
    return rel.sum(-1).astype(np.int32)


class ChannelAttention(nn.Module):
    """RCAN channel attention: GAP -> 1x1 squeeze -> ReLU -> 1x1 -> sigmoid
    (hat.py:10-29)."""

    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv2d_torch(
            self.num_feat // self.squeeze_factor, self.num_feat, kernel=1,
            name="attention_1",
        )(y)
        y = nn.relu(y)
        y = conv2d_torch(
            self.num_feat, self.num_feat // self.squeeze_factor, kernel=1,
            name="attention_3",
        )(y)
        return x * nn.sigmoid(y)


class CAB(nn.Module):
    """conv -> GELU -> conv -> channel attention (hat.py:32-44)."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mid = self.num_feat // self.compress_ratio
        x = conv2d_torch(mid, self.num_feat, name="cab_0")(x)
        x = nn.gelu(x, approximate=False)
        x = conv2d_torch(self.num_feat, mid, name="cab_2")(x)
        return ChannelAttention(self.num_feat, self.squeeze_factor, name="ca")(x)


class HATWindowAttention(nn.Module):
    """W-MSA with external RPI (hat.py:47-138)."""

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
        qkv = dense_torch_init("qkv", 3 * c, use_bias=self.qkv_bias)(x)
        qkv = qkv.reshape(b_, n, 3, nh, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )
        bias = bias_table[rpi.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return dense_torch_init("proj", c)(out)


class HAB(nn.Module):
    """Hybrid Attention Block (hat.py:141-271)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
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
        img = x.reshape(b, h, w, c)

        conv_x = CAB(
            c, self.compress_ratio, self.squeeze_factor, name="conv_block"
        )(img)
        conv_x = conv_x.reshape(b, l, c)

        if shift > 0:
            shifted = jnp.roll(img, (-shift, -shift), axis=(1, 2))
        else:
            shifted = img
        xw = window_partition(shifted, ws).reshape(-1, ws * ws, c)
        mask_np = shifted_window_mask(h, w, ws, shift)
        mask = jnp.asarray(mask_np) if mask_np is not None else None
        attn = HATWindowAttention(c, (ws, ws), self.num_heads, name="attn")(xw, mask)
        attn = window_reverse(attn.reshape(-1, ws, ws, c), ws, h, w)
        if shift > 0:
            attn = jnp.roll(attn, (shift, shift), axis=(1, 2))
        attn_x = attn.reshape(b, l, c)

        # rate_override: traced per-block rate from a scanned group stack
        rate = (
            rate_override if rate_override is not None else self.drop_path_rate
        )
        use_dp = not deterministic and (
            rate_override is not None or self.drop_path_rate > 0.0
        )
        rng = self.make_rng("droppath") if use_dp else None
        x = (
            shortcut
            + drop_path(attn_x, rate, deterministic, rng)
            + conv_x * self.conv_scale
        )
        y = Mlp(int(c * self.mlp_ratio), c, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        rng2 = self.make_rng("droppath") if use_dp else None
        return x + drop_path(y, rate, deterministic, rng2)


def unfold_overlap_windows(x: Array, ws: int, owin: int) -> Array:
    """torch nn.Unfold(kernel=owin, stride=ws, pad=(owin-ws)//2) equivalent.

    x: (B, H, W, C) -> (B*nW, owin*owin, C), windows in row-major order
    (matching torch unfold's (C, kh, kw) patch layout, hat.py:346-355).

    Built from STATIC strided slices: split each spatial axis into panels of
    g = gcd(ws, owin) rows, so window i covers panels (ws/g)*i + [0, owin/g)
    and each panel offset is one strided slice. The obvious lowering via
    `lax.conv_general_dilated_patches` costs 387 ms/op on the TPU backend at
    HAT's production shape (416^2, 360ch) — 6 OCABs made it ~75% of HAT's
    serve latency; this form is pure slice/reshape/transpose (~1 ms)."""
    import math

    b, h, w, c = x.shape
    pad = (owin - ws) // 2
    nh, nw = h // ws, w // ws
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad

    g = math.gcd(ws, owin)
    k = owin // g  # panels per window
    s = ws // g  # panel stride between consecutive windows
    assert hp % g == 0 and wp % g == 0

    # rows: (b, hp/g, g, wp, c) -> (b, nh, owin, wp, c)
    xr = xp.reshape(b, hp // g, g, wp, c)
    rows = jnp.concatenate(
        [xr[:, a : a + s * (nh - 1) + 1 : s] for a in range(k)], axis=2
    )
    # cols: (b, nh, owin, wp/g, g, c) -> (b, nh, owin, nw, owin, c)
    xc = rows.reshape(b, nh, owin, wp // g, g, c)
    cols = jnp.concatenate(
        [xc[:, :, :, a : a + s * (nw - 1) + 1 : s] for a in range(k)], axis=4
    )
    out = cols.transpose(0, 1, 3, 2, 4, 5)  # (b, nh, nw, owin, owin, c)
    return out.reshape(b * nh * nw, owin * owin, c)


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat.py:274-396)."""

    dim: int
    input_resolution: Tuple[int, int]
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, x_size: Tuple[int, int]) -> Array:
        h, w = x_size
        b, l, c = x.shape
        ws = self.window_size
        owin = int(ws * self.overlap_ratio) + ws
        nh = self.num_heads
        d = c // nh
        scale = d**-0.5

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        img = x.reshape(b, h, w, c)

        qkv = dense_torch_init("qkv", 3 * c, use_bias=self.qkv_bias)(img)
        q = qkv[..., :c]
        kv = qkv[..., c:]

        q_windows = window_partition(q, ws).reshape(-1, ws * ws, c)
        kv_windows = unfold_overlap_windows(kv, ws, owin)  # (b*nW, owin^2, 2c)
        k_windows = kv_windows[..., :c]
        v_windows = kv_windows[..., c:]

        b_, nq, _ = q_windows.shape
        n = owin * owin
        qh = q_windows.reshape(b_, nq, nh, d).transpose(0, 2, 1, 3)
        kh = k_windows.reshape(b_, n, nh, d).transpose(0, 2, 1, 3)
        vh = v_windows.reshape(b_, n, nh, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", qh * scale, kh, preferred_element_type=jnp.float32
        )
        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((ws + owin - 1) * (ws + owin - 1), nh),
        )
        rpi = jnp.asarray(rpi_oca(ws, self.overlap_ratio))
        bias = bias_table[rpi.reshape(-1)].reshape(nq, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b_, nq, c)

        out = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w).reshape(b, l, c)
        x = dense_torch_init("proj", c)(out) + shortcut
        y = Mlp(int(c * self.mlp_ratio), c, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        return x + y


class RHAG(nn.Module):
    """Residual Hybrid Attention Group (hat.py:399-611)."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float = 4.0
    drop_path_rates: Sequence[float] = ()
    use_checkpoint: bool = False
    resi_connection: str = "1conv"

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_size: Tuple[int, int],
        deterministic: bool = True,
        rates_override: Optional[Array] = None,
    ) -> Array:
        shortcut = x
        hab_cls = (
            nn.remat(HAB, static_argnums=(2, 3)) if self.use_checkpoint else HAB
        )
        for i in range(self.depth):
            x = hab_cls(
                dim=self.dim,
                input_resolution=self.input_resolution,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale,
                mlp_ratio=self.mlp_ratio,
                drop_path_rate=(
                    self.drop_path_rates[i] if i < len(self.drop_path_rates) else 0.0
                ),
                name=f"blocks_{i}",
            )(
                x,
                x_size,
                deterministic,
                None if rates_override is None else rates_override[i],
            )
        x = OCAB(
            dim=self.dim,
            input_resolution=self.input_resolution,
            window_size=self.window_size,
            overlap_ratio=self.overlap_ratio,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            name="overlap_attn",
        )(x, x_size)
        img = to_image(x, x_size)
        if self.resi_connection == "1conv":
            img = conv2d_torch(self.dim, self.dim, name="conv")(img)
        return to_tokens(img) + shortcut

    def scan_step(self, x, rates, x_size, deterministic):
        """`lax.scan` body over structurally-identical RHAGs: carry = x,
        scanned input = this group's (depth,) drop-path rate vector.
        Collapses the unrolled 6-group train graph ~6x (docs/TRAINING.md
        remote-AOT size-cap blocker)."""
        return self(x, x_size, deterministic, rates), ()


class HAT(nn.Module):
    """HAT model (hat.py:614-913)."""

    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_checkpoint: bool = False
    upscale: int = 2
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    num_feat: int = 64
    # scan-compress the RHAG stack (one traced group body `lax.scan`ned over
    # stacked per-group params). Exact same math (tests/test_scan_layers.py);
    # param layout differs — models.scan_stack converts.
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        ed = self.embed_dim
        h, w = x.shape[1], x.shape[2]
        x_size = (h, w)
        patches_resolution = (
            self.img_size // self.patch_size,
            self.img_size // self.patch_size,
        )
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        feat = conv2d_torch(ed, self.in_chans, name="conv_first")(x)

        t = to_tokens(feat)
        if self.patch_norm:
            t = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(t)
        if self.scan_layers:
            n = len(self.depths)
            if len(set(self.num_heads)) != 1 or len(set(self.depths)) != 1:
                raise ValueError(
                    "scan_layers requires uniform depths/num_heads across "
                    f"groups, got {self.depths}/{self.num_heads}"
                )
            rates = jnp.asarray(
                np.asarray(dpr, np.float32).reshape(n, self.depths[0])
            )
            from .scan_stack import scanned_group_module

            scanned = scanned_group_module(
                RHAG,
                length=n,
                use_checkpoint=self.use_checkpoint,
                dim=ed,
                input_resolution=patches_resolution,
                depth=self.depths[0],
                num_heads=self.num_heads[0],
                window_size=self.window_size,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale,
                overlap_ratio=self.overlap_ratio,
                mlp_ratio=self.mlp_ratio,
                resi_connection=self.resi_connection,
            )
            t, _ = scanned.scan_step(t, rates, x_size, deterministic)
        else:
            for i, depth in enumerate(self.depths):
                sl = slice(sum(self.depths[:i]), sum(self.depths[: i + 1]))
                t = RHAG(
                    dim=ed,
                    input_resolution=patches_resolution,
                    depth=depth,
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    compress_ratio=self.compress_ratio,
                    squeeze_factor=self.squeeze_factor,
                    conv_scale=self.conv_scale,
                    overlap_ratio=self.overlap_ratio,
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rates=tuple(dpr[sl]),
                    use_checkpoint=self.use_checkpoint,
                    resi_connection=self.resi_connection,
                    name=f"layers_{i}",
                )(t, x_size, deterministic)
        t = nn.LayerNorm(epsilon=1e-5, name="norm")(t)
        body = to_image(t, x_size)

        feat = conv2d_torch(ed, ed, name="conv_after_body")(body) + feat
        if self.upsampler == "pixelshuffle":
            feat = conv2d_torch(self.num_feat, ed, name="conv_before_upsample")(feat)
            feat = nn.leaky_relu(feat, negative_slope=0.01)
            feat = UpsampleStack(self.upscale, self.num_feat, name="upsample")(feat)
            feat = conv2d_torch(self.in_chans, self.num_feat, name="conv_last")(feat)
        else:
            # the reference silently returns the embed-dim feature map here
            # (hat.py:904-909) — fail loudly instead of shipping a
            # (B, H, W, 180) "image" into the loss
            raise ValueError(
                f"HAT implements upsampler='pixelshuffle' only, got "
                f"{self.upsampler!r}"
            )
        return feat
