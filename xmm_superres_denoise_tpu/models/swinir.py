"""SwinIR and SwinFIR restoration transformers in Flax, NHWC.

Re-implements the reference SwinIR
(`/root/reference/xmm_superres_denoise/models/transformer/swinir.py:22-406`)
and SwinFIR (`transformer/swinfir.py:14-455`). SwinFIR = SwinIR with the
residual conv of each RSTB replaced by an SFB (spatial ResB + fast-Fourier
SpectralTransform fused by a 1x1 conv, swinfir.py:105-117); its FourierUnit
(swinfir.py:14-61) maps to `jnp.fft.rfftn`/`irfftn` ('ortho'), which XLA
lowers to on-device FFTs.

Structure (swinir.py:350-395):
  conv_first 3x3 -> [RSTB]* -> LayerNorm -> conv_after_body + skip
  -> upsampler head ('pixelshuffle' | 'pixelshuffledirect' | 'nearest+conv'
     | '' = denoise head with global input skip)

Mean-shift: single-channel path uses mean 0, img_range 1 (swinir.py:189-194)
— a no-op kept out of the graph.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .swin_common import (
    BasicLayer,
    UpsampleOneStep,
    UpsampleStack,
    conv2d_torch,
    to_image,
    to_tokens,
)

Array = jnp.ndarray


def _dft_mats_w(w: int):
    """Real-valued rfft/irfft (norm='ortho') along a length-w axis as
    matmul constants.

    Forward (x real, length w -> w2 = w//2+1 bins):
        re = x @ CW,  im = x @ SW         CW[n,k] =  cos(2pi nk/w)/sqrt(w)
                                          SW[n,k] = -sin(2pi nk/w)/sqrt(w)
    Inverse (Hermitian half-spectrum -> real length w):
        x  = re @ C2 + im @ S2            C2[k,n] =  m_k cos(2pi kn/w)/sqrt(w)
                                          S2[k,n] = -m_k sin(2pi kn/w)/sqrt(w)
    with multiplicity m_k = 1 for k in {0, w/2 (w even)}, else 2 (the
    suppressed conjugate bins)."""
    w2 = w // 2 + 1
    n = np.arange(w)[:, None]
    k = np.arange(w2)[None, :]
    ang = 2.0 * np.pi * n * k / w
    scale = 1.0 / np.sqrt(w)
    cw = (np.cos(ang) * scale).astype(np.float32)
    sw = (-np.sin(ang) * scale).astype(np.float32)
    mult = np.full((w2,), 2.0, np.float32)
    mult[0] = 1.0
    if w % 2 == 0:
        mult[-1] = 1.0
    c2 = (cw.T * mult[:, None]).astype(np.float32)
    s2 = (sw.T * mult[:, None]).astype(np.float32)
    return cw, sw, c2, s2


def _dft_mats_h(h: int):
    """Full complex DFT (norm='ortho') along a length-h axis as real matmul
    constants: CH[m,n] = cos(2pi mn/h)/sqrt(h), SH[m,n] = sin(2pi mn/h)/sqrt(h).

    Forward of (a + ib):  re' = CH a + SH b,  im' = CH b - SH a
    Inverse (unitary):    re' = CH a - SH b,  im' = CH b + SH a
    """
    m = np.arange(h)[:, None]
    n = np.arange(h)[None, :]
    ang = 2.0 * np.pi * m * n / h
    scale = 1.0 / np.sqrt(h)
    return (np.cos(ang) * scale).astype(np.float32), (
        np.sin(ang) * scale
    ).astype(np.float32)


class FourierUnit(nn.Module):
    """rfft2 -> 1x1 conv on (re, im) channels -> LeakyReLU -> irfft2
    (swinfir.py:14-61, norm='ortho').

    The 2-D transforms are REAL-VALUED DFT matmuls over precomputed
    cos/sin constants (spatial sizes are static under jit) — no complex
    dtypes anywhere, so the graph runs on TPU backends without complex-op
    lowerings and every transform rides the MXU. Validated against
    numpy rfft2/irfft2(norm='ortho') in tests/test_transformer_zoo.py.
    Channel packing matches torch: interleaved (c0_re, c0_im, c1_re, ...)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        cw, sw, c2, s2 = (jnp.asarray(m) for m in _dft_mats_w(w))
        ch, sh = (jnp.asarray(m) for m in _dft_mats_h(h))
        xt = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))  # b, c, h, w
        # rfft along W: (b,c,h,w) @ (w,w2)
        re = xt @ cw
        im = xt @ sw
        # full fft along H (contract axis 2 with the symmetric DFT matrices)
        re, im = (
            jnp.einsum("mh,bchk->bcmk", ch, re)
            + jnp.einsum("mh,bchk->bcmk", sh, im),
            jnp.einsum("mh,bchk->bcmk", ch, im)
            - jnp.einsum("mh,bchk->bcmk", sh, re),
        )
        w2 = re.shape[-1]
        ffs = jnp.stack([re, im], axis=2)  # b, c, 2, h, w2
        ffs = ffs.reshape(b, c * 2, h, w2)
        ffs = jnp.transpose(ffs, (0, 2, 3, 1))  # NHWC for the 1x1 conv
        ffs = conv2d_torch(c * 2, c * 2, kernel=1, name="conv_layer")(ffs)
        ffs = nn.leaky_relu(ffs, negative_slope=0.2)
        ffs = jnp.transpose(ffs, (0, 3, 1, 2)).reshape(b, c, 2, h, w2)
        re, im = ffs[:, :, 0], ffs[:, :, 1]
        # inverse fft along H (unitary conj), then irfft along W
        re, im = (
            jnp.einsum("mh,bchk->bcmk", ch, re)
            - jnp.einsum("mh,bchk->bcmk", sh, im),
            jnp.einsum("mh,bchk->bcmk", ch, im)
            + jnp.einsum("mh,bchk->bcmk", sh, re),
        )
        out = re @ c2 + im @ s2  # b, c, h, w (real)
        return jnp.transpose(out, (0, 2, 3, 1)).astype(x.dtype)


class SpectralTransform(nn.Module):
    """1x1 squeeze -> FourierUnit -> 1x1 expand with inner skip
    (swinfir.py:64-87)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        half = self.embed_dim // 2
        x = conv2d_torch(half, self.embed_dim, kernel=1, name="conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        out = FourierUnit(half, name="fu")(x)
        return conv2d_torch(self.embed_dim, half, kernel=1, name="conv2")(x + out)


class ResB(nn.Module):
    """conv-lrelu-conv residual block (swinfir.py:91-102)."""

    embed_dim: int
    red: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mid = self.embed_dim // self.red
        y = conv2d_torch(mid, self.embed_dim, name="body_0")(x)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = conv2d_torch(self.embed_dim, mid, name="body_2")(y)
        return y + x


class SFB(nn.Module):
    """Spatial-frequency block: ResB || SpectralTransform -> 1x1 fusion
    (swinfir.py:105-117)."""

    embed_dim: int
    red: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = ResB(self.embed_dim, self.red, name="S")(x)
        f = SpectralTransform(self.embed_dim, name="F")(x)
        out = jnp.concatenate([s, f], axis=-1)
        return conv2d_torch(self.embed_dim, 2 * self.embed_dim, kernel=1,
                            name="fusion")(out)


class RSTB(nn.Module):
    """Residual Swin Transformer Block (swinir.py:22-130 / swinfir.py:120-215):
    BasicLayer -> residual conv ('1conv' | 'SFB' | 'HSFB' | 'identity') + skip."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rates: Sequence[float] = ()
    use_checkpoint: bool = False
    resi_connection: str = "1conv"

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_size: Tuple[int, int],
        deterministic: bool = True,
        rates_override=None,
    ) -> Array:
        res = BasicLayer(
            dim=self.dim,
            input_resolution=self.input_resolution,
            depth=self.depth,
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_path_rates=tuple(self.drop_path_rates),
            use_checkpoint=self.use_checkpoint,
            name="residual_group",
        )(x, x_size, deterministic, rates_override)
        img = to_image(res, x_size)
        if self.resi_connection == "1conv":
            img = conv2d_torch(self.dim, self.dim, name="conv")(img)
        elif self.resi_connection == "SFB":
            img = SFB(self.dim, 1, name="conv")(img)
        elif self.resi_connection == "HSFB":
            img = SFB(self.dim, 2, name="conv")(img)
        elif self.resi_connection == "identity":
            pass
        else:
            raise ValueError(self.resi_connection)
        return to_tokens(img) + x

    def scan_step(self, x, rates, x_size, deterministic):
        """`lax.scan` body over structurally-identical RSTBs: carry = x,
        scanned input = this layer's (depth,) drop-path rate vector
        (graph-compression strategy of models/scan_stack.py)."""
        return self(x, x_size, deterministic, rates), ()


class SwinIR(nn.Module):
    """SwinIR (swinir.py:133-395). Set resi_connection='SFB' for SwinFIR."""

    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    use_checkpoint: bool = False
    upscale: int = 2
    upsampler: str = ""
    resi_connection: str = "1conv"
    num_feat: int = 64
    # scan-compress the RSTB stack (one traced layer body `lax.scan`ned over
    # stacked per-layer params). Exact same math (tests/test_scan_layers.py);
    # param layout differs — models.scan_stack converts.
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h_in, w_in = x.shape[1], x.shape[2]
        ed = self.embed_dim
        patches_resolution = (
            self.img_size // self.patch_size,
            self.img_size // self.patch_size,
        )

        # reflect-pad to a window multiple (swinir.py:328-333); static shapes.
        eff_ws = min(self.window_size, min(patches_resolution))
        ph = (eff_ws - h_in % eff_ws) % eff_ws
        pw = (eff_ws - w_in % eff_ws) % eff_ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = h_in + ph, w_in + pw
        x_size = (h, w)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        def features(feat: Array) -> Array:
            t = to_tokens(feat)
            if self.patch_norm:
                t = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(t)
            if self.scan_layers:
                n = len(self.depths)
                if (
                    len(set(self.num_heads)) != 1
                    or len(set(self.depths)) != 1
                ):
                    raise ValueError(
                        "scan_layers requires uniform depths/num_heads "
                        f"across layers, got {self.depths}/{self.num_heads}"
                    )
                rates = jnp.asarray(
                    np.asarray(dpr, np.float32).reshape(n, self.depths[0])
                )
                from .scan_stack import scanned_group_module

                scanned = scanned_group_module(
                    RSTB,
                    length=n,
                    use_checkpoint=self.use_checkpoint,
                    dim=ed,
                    input_resolution=patches_resolution,
                    depth=self.depths[0],
                    num_heads=self.num_heads[0],
                    window_size=self.window_size,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    resi_connection=self.resi_connection,
                )
                t, _ = scanned.scan_step(t, rates, x_size, deterministic)
            else:
                for i, depth in enumerate(self.depths):
                    sl = slice(
                        sum(self.depths[:i]), sum(self.depths[: i + 1])
                    )
                    t = RSTB(
                        dim=ed,
                        input_resolution=patches_resolution,
                        depth=depth,
                        num_heads=self.num_heads[i],
                        window_size=self.window_size,
                        mlp_ratio=self.mlp_ratio,
                        qkv_bias=self.qkv_bias,
                        drop_path_rates=tuple(dpr[sl]),
                        use_checkpoint=self.use_checkpoint,
                        resi_connection=self.resi_connection,
                        name=f"layers_{i}",
                    )(t, x_size, deterministic)
            t = nn.LayerNorm(epsilon=1e-5, name="norm")(t)
            return to_image(t, x_size)

        nf = self.num_feat
        out_ch = self.in_chans

        if self.upsampler == "pixelshuffle":
            feat = conv2d_torch(ed, self.in_chans, name="conv_first")(x)
            feat = conv2d_torch(ed, ed, name="conv_after_body")(features(feat)) + feat
            feat = conv2d_torch(nf, ed, name="conv_before_upsample")(feat)
            feat = nn.leaky_relu(feat, negative_slope=0.01)
            feat = UpsampleStack(self.upscale, nf, name="upsample")(feat)
            out = conv2d_torch(out_ch, nf, name="conv_last")(feat)
        elif self.upsampler == "pixelshuffledirect":
            feat = conv2d_torch(ed, self.in_chans, name="conv_first")(x)
            feat = conv2d_torch(ed, ed, name="conv_after_body")(features(feat)) + feat
            out = UpsampleOneStep(self.upscale, ed, out_ch, name="upsample")(feat)
        elif self.upsampler == "nearest+conv":
            feat = conv2d_torch(ed, self.in_chans, name="conv_first")(x)
            feat = conv2d_torch(ed, ed, name="conv_after_body")(features(feat)) + feat
            feat = conv2d_torch(nf, ed, name="conv_before_upsample")(feat)
            feat = nn.leaky_relu(feat, negative_slope=0.01)
            feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
            feat = nn.leaky_relu(
                conv2d_torch(nf, nf, name="conv_up1")(feat), negative_slope=0.2
            )
            if self.upscale == 4:
                feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
                feat = nn.leaky_relu(
                    conv2d_torch(nf, nf, name="conv_up2")(feat), negative_slope=0.2
                )
            feat = nn.leaky_relu(
                conv2d_torch(nf, nf, name="conv_hr")(feat), negative_slope=0.2
            )
            out = conv2d_torch(out_ch, nf, name="conv_last")(feat)
        else:
            # denoise / artifact-reduction head with global input skip
            feat = conv2d_torch(ed, self.in_chans, name="conv_first")(x)
            res = conv2d_torch(ed, ed, name="conv_after_body")(features(feat)) + feat
            out = x + conv2d_torch(out_ch, ed, name="conv_last")(res)

        return out[:, : h_in * self.upscale, : w_in * self.upscale, :]


def SwinFIR(**kwargs) -> SwinIR:
    """SwinFIR = SwinIR with SFB residual connections (swinfir.py:218-455)."""
    kwargs.setdefault("resi_connection", "SFB")
    return SwinIR(**kwargs)
