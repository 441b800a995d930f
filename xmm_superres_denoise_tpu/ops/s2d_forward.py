"""Whole-forward space-to-depth pipelines for the RRDB models (plain XLA).

Runs the ENTIRE GeneratorRRDB_SR / _DN forward in the 2x2 space-to-depth
domain: every 3x3 conv becomes an exactly-equivalent 3x3 conv at half
resolution with 4x channels (ops/space_to_depth.py), so all matmuls run on
full 128-wide MXU lanes instead of 32 and every tensor is layout-aligned.

The SR head needs no permutation fix-up: `pixel_shuffle(., 2)` and the 2x2
space-to-depth packing are exact inverses with the same channel convention
(models/rrdb.py:pixel_shuffle/pixel_unshuffle), so the S2D representation of
the pixel-shuffled tensor IS the upconv output's S2D representation. The
convs that nominally run at 832^2 (HRconv, conv_last) are transformed TWICE
(S2D of S2D: 16x channels at 208^2) and a single d2s . d2s pair at the very
end materializes the 832^2 output. Net: the whole forward executes at 208^2,
with one cheap pack at input and one unpack at output.

Reference serve path this accelerates:
`/root/reference/xmm_superres_denoise/utils/run_inference_on_file.py:137-170`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR
from .space_to_depth import d2s, s2d, s2d_conv_weights

Array = jnp.ndarray


def _conv(x: Array, w: Array, b: Array) -> Array:
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn) + b


def _lrelu(x: Array, slope: float) -> Array:
    return jnp.where(x >= 0, x, slope * x)


def _maybe_true_f32(forward, dtype):
    """f32 here means the PARITY class: trace under matmul precision
    "float32" so TPU convs don't silently multiply in bf16
    (ops/precision.py — measured 6.6e-3 off the 1e-3 bar otherwise).
    bf16 callers keep the default (fast) lowering."""
    if dtype == jnp.float32:
        from .precision import true_f32

        return true_f32(forward)
    return forward


def _xform(entry: dict, times: int, dtype) -> tuple[Array, Array]:
    """Transform a Flax Conv param dict into the (repeated) S2D domain."""
    w = np.asarray(entry["kernel"], np.float32)
    b = np.asarray(entry["bias"], np.float32)
    for _ in range(times):
        w, b = s2d_conv_weights(w, b)
    return jnp.asarray(w, dtype), jnp.asarray(b, dtype)


def _transform_trunk(trunk: dict, num_res_blocks: int, dtype) -> dict[str, Any]:
    out: dict[str, Any] = {
        "conv_first": _xform(trunk["conv_first"], 1, dtype),
        "trunk_conv": _xform(trunk["trunk_conv"], 1, dtype),
        "blocks": [],
    }
    for i in range(num_res_blocks):
        rrdb = trunk[f"rrdb_{i}"]
        out["blocks"].append(
            [
                [_xform(rrdb[f"RDB{d}"][f"conv{c}"], 1, dtype) for c in range(1, 6)]
                for d in (1, 2, 3)
            ]
        )
    return out


def _dense_block(rdb, x: Array) -> Array:
    """One ResidualDenseBlock5C in S2D domain (gather form)."""
    feats = [x]
    for level, (w, b) in enumerate(rdb):
        h = _conv(jnp.concatenate(feats, -1) if level else x, w, b)
        if level < 4:
            h = _lrelu(h, 0.2)
            feats.append(h)
    return h * 0.2 + x


def _trunk_forward(tp: dict[str, Any], x4: Array, remat: bool = False) -> Array:
    """S2D-domain trunk: conv_first -> N x RRDB -> trunk_conv + skip.

    Dense blocks use the reference's gather form (growing-cin concat convs).
    A 'scatter' re-association (one fat-cout conv per source tensor, partial
    sums per level — exact by conv linearity) was measured SLOWER end-to-end
    (66-67 vs 70-73 tiles/s) despite isolated fat-cout convs running ~3x the
    TF/s (745 vs 250 at b32): the sliced partial-sum adds break XLA's
    conv-epilogue fusion. Keep gather; revisit only inside a fused kernel.

    `remat=True` checkpoints each dense block (the concats' saved
    activations dominate training HBM — the `memory_efficient` equivalent
    of models/rrdb.py / reference rrdb_blocks.py:40-47).
    """
    block = jax.checkpoint(_dense_block) if remat else _dense_block
    fea = _conv(x4, *tp["conv_first"])
    t = fea
    for rrdb in tp["blocks"]:
        block_in = t
        for rdb in rrdb:
            t = block(rdb, t)
        t = t * 0.2 + block_in
    trunk = _conv(t, *tp["trunk_conv"])
    return fea + trunk


def make_s2d_sr_forward(model: GeneratorRRDB_SR, params, dtype=jnp.bfloat16):
    """Build an S2D-domain forward equal to clip(model.apply(params, x), 0, 1).

    Supports the production geometry (num_upsample == 1). Input (B, H, W, C)
    with H, W divisible by 4; output (B, 2H, 2W, out_channels).
    """
    assert model.num_upsample == 1, "S2D pipeline built for num_upsample=1"
    p = params["params"]
    tp = _transform_trunk(p["trunk"], model.num_res_blocks, dtype)
    upconv = _xform(p["upconv_0"], 1, dtype)
    # Head at S2D^1, not S2D^2: each S2D application multiplies a conv's
    # FLOPs by 4 (structural-zero padding), so HRconv/conv_last cost 16x
    # nominal at S2D^2 but only 4x at S2D^1 — and 416^2 x 128ch still fills
    # the MXU's 128 lanes. One free d2s reshape moves the upconv output
    # (S2D^2-of-832^2 == S2D^1-of-416^2 of the pre-shuffle tensor, by the
    # pixel_shuffle/s2d cancellation) into the S2D^1 domain.
    hrconv = _xform(p["HRconv"], 1, dtype)
    conv_last = _xform(p["conv_last"], 1, dtype)

    def forward(x: Array) -> Array:
        x4 = s2d(x.astype(dtype))
        fea = _trunk_forward(tp, x4)
        up = _lrelu(_conv(fea, *upconv), 0.01)  # == S2D2 of pixel-shuffled fea
        h = _lrelu(_conv(d2s(up), *hrconv), 0.2)  # S2D^1: 416^2, 128ch
        out = _conv(h, *conv_last)
        return jnp.clip(d2s(out), 0.0, 1.0)

    return _maybe_true_f32(forward, dtype)


def make_s2d_train_apply(model, remat: bool = False):
    """Build an `apply(params, x)` == `model.apply(params, x)` that runs the
    whole forward in the S2D domain with the weight transforms IN-GRAPH.

    `ops.space_to_depth.s2d_conv_weights_jnp` is a fixed linear map, so
    autodiff through this apply yields EXACT gradients w.r.t. the original
    parameters — no custom VJP needed. This is the training fast path: the
    backward pass's convs also run at full 128-lane MXU tiles. The
    per-step transform cost is negligible (weights are ~KBs).

    `remat=True` checkpoints each dense block (`memory_efficient`
    semantics). Supports GeneratorRRDB_SR (num_upsample == 1) and
    GeneratorRRDB_DN.
    """
    from .space_to_depth import s2d_conv_weights_jnp

    is_sr = isinstance(model, GeneratorRRDB_SR)
    if is_sr:
        assert model.num_upsample == 1, "S2D apply built for num_upsample=1"
    else:
        assert isinstance(model, GeneratorRRDB_DN), type(model)
    n_blocks = model.num_res_blocks

    def xf(entry):
        return s2d_conv_weights_jnp(entry["kernel"], entry["bias"])

    def apply(params, x):
        p = params["params"] if "params" in params else params
        trunk = p["trunk"]
        tp = {
            "conv_first": xf(trunk["conv_first"]),
            "trunk_conv": xf(trunk["trunk_conv"]),
            "blocks": [
                [
                    [xf(trunk[f"rrdb_{i}"][f"RDB{d}"][f"conv{c}"])
                     for c in range(1, 6)]
                    for d in (1, 2, 3)
                ]
                for i in range(n_blocks)
            ],
        }
        x4 = s2d(x)
        fea = _trunk_forward(tp, x4, remat=remat)
        if is_sr:
            up = _lrelu(_conv(fea, *xf(p["upconv_0"])), 0.01)
            h = _lrelu(_conv(d2s(up), *xf(p["HRconv"])), 0.2)
            out = _conv(h, *xf(p["conv_last"]))
        else:
            out = _conv(fea, *xf(p["conv_last"])) + x4
        # the models clip in-forward (models/rrdb.py:193,224 — reference
        # generator_rrdb.py:108,135); reproduce it so grads match too
        return jnp.clip(d2s(out), 0.0, 1.0)

    return apply


def make_s2d_dn_forward(model: GeneratorRRDB_DN, params, dtype=jnp.bfloat16):
    """S2D-domain denoiser forward: trunk -> conv_last -> input skip -> clip."""
    p = params["params"]
    tp = _transform_trunk(p["trunk"], model.num_res_blocks, dtype)
    conv_last = _xform(p["conv_last"], 1, dtype)

    def forward(x: Array) -> Array:
        x4 = s2d(x.astype(dtype))
        fea = _trunk_forward(tp, x4)
        out = _conv(fea, *conv_last) + x4
        return jnp.clip(d2s(out), 0.0, 1.0)

    return _maybe_true_f32(forward, dtype)
