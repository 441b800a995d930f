"""Transformer zoo smoke tests: shapes, finiteness, gradients (tiny configs)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavyweight numerics; default path runs -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.models import DRCT, HAT, Restormer, SwinFIR, SwinIR


def _x(b=1, s=24, c=1, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, (b, s, s, c)), jnp.float32
    )


def test_swinir_sr_shapes():
    # patch 8 -> input_resolution 3 < window 8 -> effective window 3, shift 0
    m = SwinIR(
        img_size=24, patch_size=8, in_chans=1, embed_dim=12,
        depths=(2, 2), num_heads=(2, 2), window_size=8, mlp_ratio=2.0,
        upscale=2, upsampler="pixelshuffle", num_feat=8,
    )
    x = _x()
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 48, 48, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_swinir_denoise_head():
    m = SwinIR(
        img_size=24, patch_size=8, in_chans=1, embed_dim=12,
        depths=(2,), num_heads=(2,), window_size=8, mlp_ratio=2.0,
        upscale=1, upsampler="",
    )
    x = _x(seed=1)
    v = m.init(jax.random.PRNGKey(1), x)
    assert m.apply(v, x).shape == (1, 24, 24, 1)


def test_swinir_with_shifted_windows():
    # patch 1 -> input_resolution 24 > window 6 -> real shifted windows
    m = SwinIR(
        img_size=24, patch_size=1, in_chans=1, embed_dim=12,
        depths=(2,), num_heads=(2,), window_size=6, mlp_ratio=2.0,
        upscale=1, upsampler="",
    )
    x = _x(seed=2)
    v = m.init(jax.random.PRNGKey(2), x)
    assert m.apply(v, x).shape == (1, 24, 24, 1)


def test_swinfir_spectral_path():
    m = SwinFIR(
        img_size=24, patch_size=8, in_chans=1, embed_dim=12,
        depths=(2,), num_heads=(2,), window_size=8, mlp_ratio=2.0,
        upscale=2, upsampler="pixelshuffle", num_feat=8,
    )
    x = _x(seed=3)
    v = m.init(jax.random.PRNGKey(3), x)
    y = m.apply(v, x)
    assert y.shape == (1, 48, 48, 1)
    assert np.all(np.isfinite(np.asarray(y)))
    # SFB params present
    assert "conv" in v["params"]["layers_0"]
    assert "fu" in v["params"]["layers_0"]["conv"]["F"]


def test_drct_shapes_and_residual():
    m = DRCT(
        img_size=24, patch_size=8, in_chans=1, embed_dim=12,
        depths=(1, 1), num_heads=(2, 2), window_size=8, mlp_ratio=2.0,
        upscale=2, gc=6, num_feat=8,
    )
    x = _x(seed=4)
    v = m.init(jax.random.PRNGKey(4), x)
    y = m.apply(v, x)
    assert y.shape == (1, 48, 48, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_hat_shapes():
    m = HAT(
        img_size=24, patch_size=1, in_chans=1, embed_dim=12,
        depths=(2,), num_heads=(2,), window_size=6, mlp_ratio=2.0,
        upscale=2, squeeze_factor=4, num_feat=8, overlap_ratio=1 / 3,
    )  # overlap must keep (owin - ws) even, as in the production 16->24 case
    x = _x(seed=5)
    v = m.init(jax.random.PRNGKey(5), x)
    y = m.apply(v, x)
    assert y.shape == (1, 48, 48, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_hat_unfold_matches_torch():
    import torch

    from xmm_superres_denoise_tpu.models.hat import unfold_overlap_windows

    x = np.random.default_rng(6).normal(size=(2, 12, 12, 3)).astype(np.float32)
    ws, owin = 4, 6
    ours = np.asarray(unfold_overlap_windows(jnp.asarray(x), ws, owin))
    # torch unfold on NCHW
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    unf = torch.nn.Unfold(kernel_size=owin, stride=ws, padding=(owin - ws) // 2)
    ref = unf(xt)  # (B, C*owin*owin, nW)
    nw = ref.shape[-1]
    ref = (
        ref.view(2, 3, owin * owin, nw).permute(0, 3, 2, 1).reshape(-1, owin * owin, 3)
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6)


def test_restormer_shapes_and_grad():
    m = Restormer(
        inp_channels=1, out_channels=1, dim=8, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, heads=(1, 2, 4, 8),
    )
    x = _x(s=32, seed=7)
    v = m.init(jax.random.PRNGKey(7), x)
    y = m.apply(v, x)
    assert y.shape == (1, 32, 32, 1)

    def loss(params):
        return jnp.mean(jnp.square(m.apply(params, x) - 0.5))

    g = jax.grad(loss)(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in leaves)


def test_registry_builds_transformers():
    from xmm_superres_denoise_tpu.config import ModelCfg, OptimizerCfg, TransformerCfg
    from xmm_superres_denoise_tpu.models import build_model

    for name in ("swinir", "swinfir", "drct", "hat"):
        # HAT's channel attention squeezes by 30 (hat.py:33) — embed_dim must
        # be >= 30 there, as in the production config (180).
        embed = 60 if name == "hat" else 12
        cfg = ModelCfg(
            name=name,
            memory_efficient=False,
            batch_size=1,
            model=TransformerCfg(
                base_model=name, img_size=24, window_size=8, patch_size=8,
                embed_dim=embed, upsampler="pixelshuffle", in_channels=1,
                num_heads=[2], depths=[1],
            ),
            optimizer=OptimizerCfg(learning_rate=2e-4),
        )
        model = build_model(cfg, (24, 24), (48, 48))
        x = _x(seed=8)
        v = model.init(jax.random.PRNGKey(8), x)
        assert model.apply(v, x).shape == (1, 48, 48, 1)


def test_dft_matmul_matrices_match_numpy_fft():
    """The real-valued DFT matmul constants == numpy rfft2/irfft2 (ortho)."""
    from xmm_superres_denoise_tpu.models.swinir import _dft_mats_h, _dft_mats_w

    for h, w in [(16, 16), (12, 15), (416, 416)]:
        x = np.random.default_rng(h * w).normal(size=(2, 3, h, w)).astype(np.float32)
        cw, sw, c2, s2 = _dft_mats_w(w)
        ch, sh = _dft_mats_h(h)
        re, im = x @ cw, x @ sw
        re, im = (
            np.einsum("mh,bchk->bcmk", ch, re) + np.einsum("mh,bchk->bcmk", sh, im),
            np.einsum("mh,bchk->bcmk", ch, im) - np.einsum("mh,bchk->bcmk", sh, re),
        )
        ref = np.fft.fft(np.fft.rfft(x, axis=-1, norm="ortho"), axis=-2, norm="ortho")
        np.testing.assert_allclose(re, ref.real, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(im, ref.imag, rtol=1e-4, atol=1e-4)
        # inverse roundtrip
        re2, im2 = (
            np.einsum("mh,bchk->bcmk", ch, re) - np.einsum("mh,bchk->bcmk", sh, im),
            np.einsum("mh,bchk->bcmk", ch, im) + np.einsum("mh,bchk->bcmk", sh, re),
        )
        back = re2 @ c2 + im2 @ s2
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_fourier_unit_matches_numpy_fft_reference():
    """FourierUnit (DFT-matmul impl) == a numpy rfft2/conv/irfft2 replica."""
    from xmm_superres_denoise_tpu.models.swinir import FourierUnit

    b, h, w, c = 2, 12, 16, 4
    x = np.random.default_rng(0).normal(size=(b, h, w, c)).astype(np.float32)
    fu = FourierUnit(c)
    params = fu.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(fu.apply(params, jnp.asarray(x)))

    k = np.asarray(params["params"]["conv_layer"]["kernel"])[0, 0]  # (2c, 2c)
    bias = np.asarray(params["params"]["conv_layer"]["bias"])
    xt = np.transpose(x, (0, 3, 1, 2))
    ff = np.fft.fft(np.fft.rfft(xt, axis=-1, norm="ortho"), axis=-2, norm="ortho")
    w2 = ff.shape[-1]
    ffs = np.stack([ff.real, ff.imag], axis=2).reshape(b, c * 2, h, w2)
    ffs = np.einsum("bihw,io->bohw", ffs, k) + bias[None, :, None, None]
    ffs = np.where(ffs >= 0, ffs, 0.2 * ffs)
    ffc = ffs.reshape(b, c, 2, h, w2)
    ffc = ffc[:, :, 0] + 1j * ffc[:, :, 1]
    out = np.fft.irfft(np.fft.ifft(ffc, axis=-2, norm="ortho"), w, axis=-1,
                       norm="ortho")
    ref = np.transpose(out, (0, 2, 3, 1)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("use_ckpt", [False, True])
def test_swinir_remat_same_numerics(use_ckpt):
    """memory_efficient (nn.remat) must not change outputs or break grads
    (the reference's use_checkpoint flag, modules.py:585-587)."""
    x = _x(seed=12)
    kw = dict(img_size=24, patch_size=1, in_chans=1, embed_dim=12,
              depths=(2,), num_heads=(2,), window_size=6, mlp_ratio=2.0,
              upscale=1, upsampler="", drop_path_rate=0.0)
    base = SwinIR(use_checkpoint=False, **kw)
    v = base.init(jax.random.PRNGKey(12), x)
    ref = base.apply(v, x)
    m = SwinIR(use_checkpoint=use_ckpt, **kw)
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda p: float(0) + jnp.sum(m.apply(p, x) ** 2))(v)
    assert all(
        np.all(np.isfinite(np.asarray(t))) for t in jax.tree_util.tree_leaves(g)
    )
