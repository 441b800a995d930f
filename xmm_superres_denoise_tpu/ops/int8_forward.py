"""int8 (w8a8) space-to-depth serving path for the RRDB models.

The round-2 calibration (scripts/device_calibrate.py) shows the chip is
COMPUTE-bound on the S2D pipeline: XLA's conv emitter sustains ~180 TF/s —
93% of the v5e's 197 TF/s bf16 peak — so the remaining serving lever is the
MXU's int8 mode (394 TOPS, 2.24x bf16). This module builds a statically
calibrated w8a8 variant of `ops/s2d_forward.py`:

  * weights: symmetric per-output-channel int8;
  * activations: symmetric per-tensor int8, scales baked from a calibration
    batch run through the f32/bf16 S2D graph (max-abs capture);
  * every 3x3 conv runs as int8 x int8 -> int32 on the MXU
    (`preferred_element_type=jnp.int32`); dequant + bias + LeakyReLU +
    requant are bf16 elementwise epilogues XLA fuses into the conv;
  * the dense-block concat mixes levels with DIFFERENT activation scales —
    handled exactly by folding each input group's scale into that group's
    weight-quantization scale so the int32 accumulator dequantizes with a
    single per-output-channel factor:
        x_j ~ x8_j * (s_j/127),  w_j ~ w8_j * q_jo,
        pick q_jo = 127*c_o/s_j  =>  y ~ y32 * c_o, uniform over j,
        c_o = max_j (s_j * max|w_j[...,o]|) / 127^2  (range-tight).

Accuracy is a measured quantity, not an assumption: `quantization_psnr`
reports PSNR of the int8 forward against the f32 forward, and the serving
CLI surfaces it. Reference serve path this accelerates:
`/root/reference/xmm_superres_denoise/utils/run_inference_on_file.py:137-170`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR
from .s2d_forward import _transform_trunk, _xform
from .space_to_depth import d2s, s2d

Array = jnp.ndarray


# --------------------------------------------------------------------------
# calibration: run the f32 S2D trunk capturing per-tensor max-abs
# --------------------------------------------------------------------------

def _conv_f32(x, w, b):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn
    ) + b


def _lrelu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _calibrate_trunk(tp: dict[str, Any], x4: Array):
    """Mirror of s2d_forward._trunk_forward that records max|t| of every
    conv INPUT tensor (what gets quantized). Keys name the consuming conv.
    Returns (amax, trunk_output)."""
    amax: dict[str, float] = {}

    def rec(key, t):
        amax[key] = float(jnp.max(jnp.abs(t)))
        return t

    fea = _conv_f32(rec("conv_first", x4), *tp["conv_first"])
    t = fea
    for bi, rrdb in enumerate(tp["blocks"]):
        block_in = t
        for di, rdb in enumerate(rrdb):
            x = t
            feats = [x]
            for level, (w, b) in enumerate(rdb):
                for j, f in enumerate(feats):
                    rec(f"b{bi}d{di}l{level}j{j}", f)
                h = _conv_f32(jnp.concatenate(feats, -1) if level else x, w, b)
                if level < 4:
                    h = _lrelu(h, 0.2)
                    feats.append(h)
            t = h * 0.2 + x
        t = t * 0.2 + block_in
    trunk = _conv_f32(rec("trunk_conv", t), *tp["trunk_conv"])
    out = rec("__trunk_out__", fea + trunk)
    return amax, out


# --------------------------------------------------------------------------
# quantization helpers
# --------------------------------------------------------------------------

def _quant_weights_grouped(
    w: np.ndarray, group_scales: Sequence[float], group_size: int
):
    """Quantize a (3,3,K,Cout) kernel whose K dim concatenates input groups
    with per-group activation scales s_j. Returns (w8, c_o) with
    y ~ conv_int32 * c_o (see module docstring)."""
    w = np.asarray(w, np.float64)
    n_groups = w.shape[2] // group_size
    assert len(group_scales) == n_groups, (len(group_scales), n_groups)
    # c_o = max_j s_j * max|w_j[..., o]| / 127^2
    c_o = np.zeros(w.shape[3])
    for j, s_j in enumerate(group_scales):
        wj = w[:, :, j * group_size : (j + 1) * group_size, :]
        c_o = np.maximum(c_o, float(s_j) * np.abs(wj).max(axis=(0, 1, 2)))
    c_o = np.maximum(c_o / (127.0 * 127.0), 1e-30)
    w8 = np.zeros_like(w)
    for j, s_j in enumerate(group_scales):
        sl = slice(j * group_size, (j + 1) * group_size)
        # w8_j = w_j * s_j / (127 * c_o)
        w8[:, :, sl, :] = w[:, :, sl, :] * float(s_j) / (127.0 * c_o)
    w8 = np.clip(np.rint(w8), -127, 127).astype(np.int8)
    return jnp.asarray(w8), jnp.asarray(c_o, jnp.float32)


def _quantize(x: Array, scale: float) -> Array:
    """bf16/f32 -> int8 with per-tensor symmetric scale (x ~ x8 * scale/127)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / scale)), -127, 127)
    return q.astype(jnp.int8)


def _conv_i8(x8: Array, w8: Array) -> Array:
    dn = lax.conv_dimension_numbers(
        x8.shape, w8.shape, ("NHWC", "HWIO", "NHWC")
    )
    return lax.conv_general_dilated(
        x8, w8, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


# --------------------------------------------------------------------------
# forward builder
# --------------------------------------------------------------------------

def calibrate_int8_scales(model, params, calib: Array) -> dict[str, float]:
    """Run the f32 S2D trunk (and, for SR, the head) on a calibration batch
    and return the per-tensor activation scales (max-abs with 8% headroom)
    as a JSON-serializable dict — the persistable deployment artifact (save
    next to the checkpoint so serving processes skip first-batch
    calibration)."""
    p = params["params"] if "params" in params else params
    tp32 = _transform_trunk(p["trunk"], model.num_res_blocks, jnp.float32)
    x4c = s2d(jnp.asarray(calib, jnp.float32))
    amax, fea = _calibrate_trunk(tp32, x4c)
    if isinstance(model, GeneratorRRDB_SR):
        # head inputs: upconv consumes the trunk output ("__trunk_out__");
        # HRconv consumes d2s(lrelu(upconv(.))) — max-abs is permutation-
        # invariant so the d2s is immaterial to the scale
        upconv = _xform(p["upconv_0"], 1, jnp.float32)
        up = _lrelu(_conv_f32(fea, *upconv), 0.01)
        amax["__hrconv_in__"] = float(jnp.max(jnp.abs(up)))
    # headroom: real inputs can exceed the calibration batch's range a bit
    return {k: max(v * 1.08, 1e-6) for k, v in amax.items()}


def make_int8_s2d_forward(
    model,
    params,
    calib: Array | None = None,
    dtype=jnp.bfloat16,
    scales: dict[str, float] | None = None,
    concat_free: bool = False,
):
    """Build a statically-calibrated w8a8 S2D forward.

    model: GeneratorRRDB_SR (num_upsample == 1) or GeneratorRRDB_DN.
    calib: (B, H, W, C) representative input batch (normalized domain) used
    once, host-side, to bake activation scales — or pass precomputed
    `scales` (from :func:`calibrate_int8_scales`) to skip the pass.
    Returns forward(x) -> clip(model-equivalent output, 0, 1); the trunk's
    60 convs and the head run int8 on the MXU, epilogues in `dtype`.

    concat_free: evaluate each dense-level conv as a SUM of per-group int8
    convs (one per concat input) instead of one conv over a materialized
    concat. EXACTLY the same int32 accumulation — the per-group activation
    scales are already folded into per-group weight slices (module
    docstring), so partial conv results add directly — but the int8 concat
    buffers (14 group-copies per dense block) never hit HBM. Measured on
    the v5e before adoption (scripts/device_probe_int8_sumconv.py).
    """
    is_sr = isinstance(model, GeneratorRRDB_SR)
    if is_sr:
        assert model.num_upsample == 1, "int8 path built for num_upsample=1"
    else:
        assert isinstance(model, GeneratorRRDB_DN)

    p = params["params"] if "params" in params else params
    tp32 = _transform_trunk(p["trunk"], model.num_res_blocks, jnp.float32)

    if scales is None:
        if calib is None:
            raise ValueError("need either a calibration batch or scales")
        scales = calibrate_int8_scales(model, params, calib)
    amax = scales

    gsz = model.num_filters * 4  # S2D group width (128 in production)

    # ---- quantize trunk weights ---- #
    def q_entry(entry, scales):
        w, b = entry
        w8, c_o = _quant_weights_grouped(np.asarray(w), scales, gsz)
        return w8, c_o, jnp.asarray(np.asarray(b), jnp.float32)

    qt: dict[str, Any] = {
        "trunk_conv": q_entry(tp32["trunk_conv"], [amax["trunk_conv"]]),
        "blocks": [],
    }
    # conv_first input is the raw S2D image (4 channels in production), so
    # its group width is the true input K, not the trunk's gsz.
    w_first = np.asarray(tp32["conv_first"][0])
    w8, c_o = _quant_weights_grouped(
        w_first, [amax["conv_first"]], w_first.shape[2]
    )
    qt["conv_first"] = (w8, c_o, jnp.asarray(
        np.asarray(tp32["conv_first"][1]), jnp.float32))

    scales_blocks: list[list[list[list[float]]]] = []
    for bi in range(model.num_res_blocks):
        qblock, sblock = [], []
        for di in range(3):
            qdense, sdense = [], []
            for level in range(5):
                s_groups = [
                    amax[f"b{bi}d{di}l{level}j{j}"] for j in range(level + 1)
                ]
                qdense.append(
                    q_entry(tp32["blocks"][bi][di][level], s_groups)
                )
                sdense.append(s_groups)
            qblock.append(qdense)
            sblock.append(sdense)
        qt["blocks"].append(qblock)
        scales_blocks.append(sblock)

    # ---- head. HRconv/conv_last at S2D^1 (4x nominal FLOPs) instead of
    # S2D^2 (16x) — see s2d_forward.make_s2d_sr_forward. The two expensive
    # head convs (upconv, HRconv) also run int8 when the scales dict carries
    # the head key (older persisted dicts fall back to the `dtype` path);
    # conv_last stays high-precision — it is tiny and writes the final
    # science product. ---- #
    quant_head = is_sr and "__hrconv_in__" in amax
    if is_sr:
        if quant_head:
            w_up = np.asarray(_xform(p["upconv_0"], 1, jnp.float32)[0])
            up8, up_c = _quant_weights_grouped(
                w_up, [amax["__trunk_out__"]], w_up.shape[2]
            )
            upconv = (up8, up_c, jnp.asarray(
                np.asarray(_xform(p["upconv_0"], 1, jnp.float32)[1]),
                jnp.float32))
            w_hr = np.asarray(_xform(p["HRconv"], 1, jnp.float32)[0])
            hr8, hr_c = _quant_weights_grouped(
                w_hr, [amax["__hrconv_in__"]], w_hr.shape[2]
            )
            hrconv = (hr8, hr_c, jnp.asarray(
                np.asarray(_xform(p["HRconv"], 1, jnp.float32)[1]),
                jnp.float32))
        else:
            upconv = _xform(p["upconv_0"], 1, dtype)
            hrconv = _xform(p["HRconv"], 1, dtype)
        conv_last = _xform(p["conv_last"], 1, dtype)
    else:
        conv_last = _xform(p["conv_last"], 1, dtype)

    def _conv_d(x, w, b):
        dn = lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn
        ) + b

    sb = scales_blocks

    def forward(x: Array) -> Array:
        x4 = s2d(x.astype(dtype))

        w8, c_o, b = qt["conv_first"]
        fea = (
            _conv_i8(_quantize(x4, amax["conv_first"]), w8).astype(jnp.float32)
            * c_o + b
        ).astype(dtype)

        t = fea
        for bi in range(model.num_res_blocks):
            block_in = t
            for di in range(3):
                x0 = t
                # int8 features, quantized once per level-tensor
                feats8 = [_quantize(x0, sb[bi][di][0][0])]
                for level in range(5):
                    w8, c_o, b = qt["blocks"][bi][di][level]
                    if concat_free and level:
                        y32 = _conv_i8(feats8[0], w8[:, :, :gsz, :])
                        for j in range(1, level + 1):
                            y32 = y32 + _conv_i8(
                                feats8[j],
                                w8[:, :, j * gsz : (j + 1) * gsz, :],
                            )
                    else:
                        x8 = (
                            jnp.concatenate(feats8, -1) if level else feats8[0]
                        )
                        y32 = _conv_i8(x8, w8)
                    y = (y32.astype(jnp.float32) * c_o + b).astype(dtype)
                    if level < 4:
                        h = _lrelu(y, 0.2)
                        feats8.append(
                            _quantize(h, sb[bi][di][level + 1][level + 1])
                        )
                    else:
                        t = y.astype(dtype) * dtype(0.2) + x0
            t = t * dtype(0.2) + block_in

        w8, c_o, b = qt["trunk_conv"]
        trunk = (
            _conv_i8(_quantize(t, amax["trunk_conv"]), w8).astype(jnp.float32)
            * c_o + b
        ).astype(dtype)
        fea = fea + trunk

        if is_sr:
            if quant_head:
                w8, c_o, b = upconv
                up = _lrelu(
                    (_conv_i8(_quantize(fea, amax["__trunk_out__"]), w8)
                     .astype(jnp.float32) * c_o + b).astype(dtype),
                    0.01,
                )
                w8, c_o, b = hrconv
                h = _lrelu(
                    (_conv_i8(
                        _quantize(d2s(up), amax["__hrconv_in__"]), w8
                    ).astype(jnp.float32) * c_o + b).astype(dtype),
                    0.2,
                )
            else:
                up = _lrelu(_conv_d(fea, *upconv), 0.01)
                h = _lrelu(_conv_d(d2s(up), *hrconv), 0.2)
            out = _conv_d(h, *conv_last)
            return jnp.clip(d2s(out), 0.0, 1.0)
        out = _conv_d(fea, *conv_last) + x4
        return jnp.clip(d2s(out), 0.0, 1.0)

    return forward


def quantization_psnr(model, params, x, calib=None) -> float:
    """PSNR (dB) of the int8 forward vs the f32 reference forward on x."""
    calib = x if calib is None else calib
    f8 = make_int8_s2d_forward(model, params, calib, dtype=jnp.float32)
    y8 = np.asarray(jax.jit(f8)(jnp.asarray(x, jnp.float32)), np.float64)
    yf = np.asarray(
        jnp.clip(model.apply(params, jnp.asarray(x, jnp.float32)), 0.0, 1.0),
        np.float64,
    )
    mse = float(np.mean((y8 - yf) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
