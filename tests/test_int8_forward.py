"""w8a8 S2D serving path: quantization algebra + end-to-end fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from xmm_superres_denoise_tpu.models import GeneratorRRDB_DN, GeneratorRRDB_SR
from xmm_superres_denoise_tpu.ops.int8_forward import (
    _conv_i8,
    _quant_weights_grouped,
    _quantize,
    make_int8_s2d_forward,
    quantization_psnr,
)


def test_grouped_quant_algebra():
    """Mixed-scale concat conv: int32 accumulator dequantizes exactly with
    one per-output-channel factor, error bounded by quantization steps."""
    g = np.random.default_rng(0)
    c, n_groups = 8, 3
    scales = [0.5, 2.0, 0.125]
    w = g.normal(size=(3, 3, n_groups * c, c)).astype(np.float32) * 0.2
    xs = [
        (g.uniform(-1, 1, size=(2, 8, 8, c)) * s).astype(np.float32)
        for s in scales
    ]

    w8, c_o = _quant_weights_grouped(w, scales, c)
    x8 = jnp.concatenate(
        [_quantize(jnp.asarray(x), s) for x, s in zip(xs, scales)], -1
    )
    y_int = np.asarray(_conv_i8(x8, w8), np.float64) * np.asarray(c_o)

    dn = lax.conv_dimension_numbers(
        (2, 8, 8, n_groups * c), w.shape, ("NHWC", "HWIO", "NHWC")
    )
    y_ref = np.asarray(
        lax.conv_general_dilated(
            jnp.concatenate([jnp.asarray(x) for x in xs], -1),
            jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn,
        )
    )
    # error budget: K quant steps of activations x weight magnitudes
    denom = np.abs(y_ref).max()
    assert np.abs(y_int - y_ref).max() / denom < 0.03


@pytest.mark.parametrize("cls,hr_mult", [(GeneratorRRDB_SR, 2),
                                         (GeneratorRRDB_DN, 1)])
def test_int8_forward_fidelity(cls, hr_mult):
    """int8 output stays close to the f32 forward (PSNR gate) and in [0,1]."""
    kw = dict(in_channels=1, out_channels=1, num_filters=8, num_res_blocks=1)
    if cls is GeneratorRRDB_SR:
        kw["num_upsample"] = 1
    model = cls(**kw)
    g = np.random.default_rng(1)
    x = jnp.asarray(g.uniform(0, 1, size=(2, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])

    psnr = quantization_psnr(model, params, x)
    assert psnr > 35.0, f"int8 quantization PSNR too low: {psnr:.1f} dB"

    fwd = make_int8_s2d_forward(model, params, x, dtype=jnp.float32)
    y = jax.jit(fwd)(x)
    assert y.shape == (2, 32 * hr_mult, 32 * hr_mult, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_int8_calib_headroom():
    """Inputs mildly outside the calibration range must not explode."""
    model = GeneratorRRDB_DN(in_channels=1, out_channels=1, num_filters=8,
                             num_res_blocks=1)
    g = np.random.default_rng(2)
    calib = jnp.asarray(g.uniform(0, 0.9, size=(2, 32, 32, 1)), jnp.float32)
    x = jnp.asarray(g.uniform(0, 1.0, size=(2, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), calib[:1])
    psnr = quantization_psnr(model, params, x, calib=calib)
    assert psnr > 30.0, f"headroom PSNR too low: {psnr:.1f} dB"


REAL = __import__("pathlib").Path("/root/reference/data/example_data/real/20ks")


@pytest.mark.slow
@pytest.mark.skipif(not REAL.exists(), reason="reference example data unavailable")
def test_int8_fidelity_on_real_xmm_image():
    """Golden check: w8a8 vs f32 predictions on a REAL 20 ks XMM split image
    (production normalization) must stay above 40 dB PSNR."""
    from xmm_superres_denoise_tpu.io.fits import read_image
    from xmm_superres_denoise_tpu.ops.preprocess import pad_to_res
    from xmm_superres_denoise_tpu.ops.stretch import Normalizer

    fits = sorted(REAL.glob("*.fits"))[0]
    img, hdr = read_image(fits)
    rate = img.astype(np.float32)
    expo = float(hdr.get("EXPOSURE", hdr.get("ONTIME", 0.0)))
    if expo > 0:
        rate = rate / expo

    nz = Normalizer(lr_max=0.0022336, hr_max=0.0005584, mode="sqrt")
    x = pad_to_res(jnp.asarray(rate)[None], 416)[..., None]
    x = nz.normalize_lr(x)

    # real-image activation distribution through the quantizer; reduced
    # width/depth keeps the CPU forward tractable (the production config is
    # timed on device via bench.py --pipeline int8)
    model = GeneratorRRDB_SR(in_channels=1, out_channels=1, num_filters=16,
                             num_res_blocks=2, num_upsample=1)
    params = model.init(jax.random.PRNGKey(0), x)
    psnr = quantization_psnr(model, params, x)
    assert psnr > 40.0, f"int8 PSNR on real data too low: {psnr:.1f} dB"


def test_int8_scales_persist_roundtrip(tmp_path):
    """calibrate_int8_scales -> JSON -> make_int8_s2d_forward(scales=...)
    reproduces the lazily-calibrated forward exactly (ROADMAP: serving
    processes skip first-batch calibration)."""
    import json

    from xmm_superres_denoise_tpu.ops.int8_forward import (
        calibrate_int8_scales,
    )

    model = GeneratorRRDB_DN(in_channels=1, out_channels=1, num_filters=8,
                             num_res_blocks=1)
    g = np.random.default_rng(5)
    x = jnp.asarray(g.uniform(0, 1, size=(2, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])

    scales = calibrate_int8_scales(model, params, x)
    path = tmp_path / "int8_scales.json"
    path.write_text(json.dumps(scales))
    loaded = json.loads(path.read_text())

    f_calib = make_int8_s2d_forward(model, params, calib=x,
                                    dtype=jnp.float32)
    f_loaded = make_int8_s2d_forward(model, params, scales=loaded,
                                     dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(f_calib)(x)), np.asarray(jax.jit(f_loaded)(x))
    )


def test_int8_forward_requires_calib_or_scales():
    model = GeneratorRRDB_DN(in_channels=1, out_channels=1, num_filters=8,
                             num_res_blocks=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    with pytest.raises(ValueError, match="calibration"):
        make_int8_s2d_forward(model, params)
