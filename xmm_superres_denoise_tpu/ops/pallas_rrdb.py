"""Pallas TPU kernel: fused RRDB residual-dense-block (5 convs, one kernel).

Performance rationale (measured on v5e, see docs/PERFORMANCE.md): XLA
executes EVERY 3x3 conv at these spatial sizes in ~3 ms regardless of
channel count or FLOPs (32->32 and 160->32 at 416^2 both ~3.0 ms; 128->128
and 640->128 at 208^2 both ~3.1 ms, the latter at 159 TFLOP/s) — the model
is per-op-overhead bound, and its forward contains ~64 convs. This kernel
computes one whole `ResidualDenseBlock5C` (models/rrdb.py, reference
rrdb_blocks.py:22-54) per grid cell:

  * the input tile is DMA'd from HBM once with an 8-pixel halo margin
    (Mosaic slices must be 8-aligned; 5 VALID convs need halo 5),
  * dense levels accumulate into ONE VMEM concat buffer (tile, 5C): each
    conv is 9 static-tap (M, k*C) @ (k*C, C) MXU matmuls over the buffer's
    channel prefix — concats never touch HBM,
  * levels stay full-tile-size: each conv's VALID output is re-padded by a
    zero ring; the garbage that accumulates in the outer ring stays inside
    the 8-pixel margin and is never consumed by the retained center,
  * per-level masking beyond the TRUE image bounds reproduces the SAME-conv
    zero padding of the reference graph exactly,
  * only the (tile, C) result is written back (0.2-scaled residual add).

Designed for the space-to-depth domain (ops/space_to_depth.py): C = 128
keeps every DMA slice and matmul 128-lane aligned. HBM traffic per block
drops from ~12 tensor reads/writes to 1 + 1. Inference-oriented (no custom
VJP yet); training uses the XLA graph path.

STATUS (round 1): numerically exact vs the Flax graph under interpret mode
(tests/test_pallas_rrdb.py). On-device compilation is currently blocked by
Mosaic limitations ("Rotate with non-32-bit data" for bf16 pltpu.roll;
slicing variants overflow scoped VMEM because unrolled tap slices are not
stack-reused) — full findings and the measured alternatives in
docs/PERFORMANCE.md. bench.py keeps this path opt-in (XMMSR_BENCH_FUSED=1).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

HALO = 5  # 5 VALID 3x3 convs deep
MARGIN = 8  # DMA'd halo margin (8-aligned slice sizes; >= HALO)


def _lrelu(x: Array) -> Array:
    return jnp.where(x >= 0, x, 0.2 * x)


def _make_dense_block_kernel(img_h: int, img_w: int):
    """Kernel factory closing over the TRUE image bounds (the padded-to-tile
    region beyond them is masked to zero at every level)."""

    def kernel(
        x_ref,  # (B, Hp+2*MARGIN, Wp+2*MARGIN, C) in ANY/HBM
        w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,  # VMEM: w_k (3,3,k*C,C)
        out_ref,  # (1, TH, TW, C) VMEM block
        buf,  # (TH+2M, TW+2M, 5C) VMEM concat buffer
        sem,
    ):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        th = out_ref.shape[1]
        tw = out_ref.shape[2]
        nf = out_ref.shape[-1]
        h0 = th + 2 * MARGIN
        w0 = tw + 2 * MARGIN

        copy = pltpu.make_async_copy(
            x_ref.at[
                bi,
                pl.ds(i * th, h0),
                pl.ds(j * tw, w0),
                :,
            ],
            buf.at[:, :, 0:nf],
            sem,
        )
        copy.start()
        copy.wait()

        dt = buf.dtype

        def mask_full(a):
            """Zero positions outside the true image (SAME zero-pad parity)."""
            rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * th - MARGIN
            cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) + j * tw - MARGIN
            keep = (rows >= 0) & (rows < img_h) & (cols >= 0) & (cols < img_w)
            return jnp.where(keep, a, jnp.zeros((), a.dtype))

        weights = ((w1, b1), (w2, b2), (w3, b3), (w4, b4), (w5, b5))
        dn = (((2,), (0,)), ((), ()))  # contract channels; (h0, w0) free
        y = None
        for level in range(1, 6):
            cin = level * nf
            w_ref, b_ref = weights[level - 1]
            w = w_ref[:].astype(dt)  # (3, 3, cin, nf)
            src = buf[:, :, 0:cin]  # (h0, w0, cin)
            acc = jnp.zeros((h0, w0, nf), jnp.float32)
            # SAME cross-correlation via circular rolls (no unaligned sublane
            # slicing): wrap-around garbage is confined to the outer ring,
            # which lives inside the margin and is never consumed.
            for dy in range(3):
                # pltpu.roll requires non-negative shifts: -k == size - k
                sh = (-(dy - 1)) % h0
                rolled_h = pltpu.roll(src, sh, 0) if sh else src
                for dx in range(3):
                    sw = (-(dx - 1)) % w0
                    shifted = (
                        pltpu.roll(rolled_h, sw, 1) if sw else rolled_h
                    )
                    acc = acc + jax.lax.dot_general(
                        shifted, w[dy, dx], dn,
                        preferred_element_type=jnp.float32,
                    )
            acc = acc + b_ref[:].astype(jnp.float32)
            y = acc
            if level < 5:
                y = mask_full(_lrelu(y).astype(dt))
                buf[:, :, level * nf : (level + 1) * nf] = y

        # y: level-5 pre-activation, full tile size; center-crop to the tile
        x5 = y[MARGIN : MARGIN + th, MARGIN : MARGIN + tw, :]
        center = buf[MARGIN : MARGIN + th, MARGIN : MARGIN + tw, 0:nf].astype(
            jnp.float32
        )
        out_ref[0] = (x5 * 0.2 + center).astype(dt)

    return kernel


@partial(jax.jit, static_argnames=("tile", "interpret"))
def dense_block_pallas(
    x: Array,
    w1: Array, b1: Array,
    w2: Array, b2: Array,
    w3: Array, b3: Array,
    w4: Array, b4: Array,
    w5: Array, b5: Array,
    tile: Tuple[int, int] = (56, 56),
    interpret: bool = False,
) -> Array:
    """Fused ResidualDenseBlock5C forward (SAME padding), NHWC.

    x: (B, H, W, C); weights HWIO, conv_i taking i*C input channels and
    producing C, matching models/rrdb.py. H/W are padded to tile multiples
    internally (the kernel masks beyond the true bounds) and cropped back.
    """
    b, h, w, c = x.shape
    th, tw = tile
    assert (th + 2 * MARGIN) % 8 == 0 and (tw + 2 * MARGIN) % 8 == 0, (
        f"tile + 2*{MARGIN} must be 8-aligned for Mosaic DMA slices, got {tile}"
    )
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    xp = jnp.pad(
        x,
        ((0, 0), (MARGIN, MARGIN + hp - h), (MARGIN, MARGIN + wp - w), (0, 0)),
    )
    grid = (b, hp // th, wp // tw)

    weight_specs = []
    for k in range(1, 6):
        weight_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # w_k
        weight_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # b_k

    out = pl.pallas_call(
        _make_dense_block_kernel(h, w),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + weight_specs,
        out_specs=pl.BlockSpec(
            (1, th, tw, c),
            lambda bi, i, j: (bi, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * MARGIN, tw + 2 * MARGIN, 5 * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5)
    return out[:, :h, :w, :]


def rrdb_pallas(x: Array, block_params, tile=(56, 56), interpret=False) -> Array:
    """Full RRDB via three fused dense blocks: out*0.2 + x (rrdb_blocks.py:57-70).

    block_params: [dense_block_1, dense_block_2, dense_block_3], each a list
    of 5 (w, b) tuples.
    """
    out = x
    for wb in block_params:
        flat = [t for pair in wb for t in pair]
        out = dense_block_pallas(out, *flat, tile=tile, interpret=interpret)
    return out * 0.2 + x


def rrdb_params_from_flax(params, n_blocks: int):
    """Extract [(w,b) x5] x3 per RRDB from the Flax GeneratorRRDB param tree."""
    trunk = params["params"]["trunk"] if "params" in params else params["trunk"]
    out = []
    for i in range(n_blocks):
        blocks = []
        rrdb = trunk[f"rrdb_{i}"]
        for k in (1, 2, 3):
            rdb = rrdb[f"RDB{k}"]
            blocks.append(
                [
                    (rdb[f"conv{j}"]["kernel"], rdb[f"conv{j}"]["bias"])
                    for j in range(1, 6)
                ]
            )
        out.append(blocks)
    return out


# --------------------------------------------------------------------------- #
# Fast full-model forward: RRDB trunk fused in space-to-depth domain
# --------------------------------------------------------------------------- #


def make_fast_rrdb_forward(
    model,
    params,
    dtype=jnp.bfloat16,
    tile: Tuple[int, int] = (56, 56),
    interpret: bool = False,
):
    """Build an optimized jitted forward for GeneratorRRDB_{SR,DN}.

    The trunk's dense blocks (the latency bulk) run as fused Pallas kernels
    in the 2x2 space-to-depth domain (`ops/space_to_depth.py`): 128-lane
    channels, one HBM read+write per block. conv_first, trunk_conv and the
    reconstruction head stay on XLA (4-5 ops). Exactly equivalent to
    `model.apply` up to dtype.
    """
    from ..models.rrdb import GeneratorRRDB_SR
    from .space_to_depth import d2s, s2d, s2d_conv_weights

    p = params["params"] if "params" in params else params
    trunk = p["trunk"]
    n_blocks = model.num_res_blocks

    def conv_w(node):
        return (
            jnp.asarray(node["kernel"], dtype),
            jnp.asarray(node["bias"], dtype),
        )

    # S2D-transformed dense-block weights (host-side, once)
    s2d_blocks = []
    for i in range(n_blocks):
        rrdb = trunk[f"rrdb_{i}"]
        for k in (1, 2, 3):
            rdb = rrdb[f"RDB{k}"]
            flat = []
            for j in range(1, 6):
                w2, b2 = s2d_conv_weights(
                    np.asarray(rdb[f"conv{j}"]["kernel"]),
                    np.asarray(rdb[f"conv{j}"]["bias"]),
                )
                flat.append(jnp.asarray(w2, dtype))
                flat.append(jnp.asarray(b2, dtype))
            s2d_blocks.append(flat)

    w_first, b_first = conv_w(trunk["conv_first"])
    w_tc, b_tc = conv_w(trunk["trunk_conv"])
    is_sr = isinstance(model, GeneratorRRDB_SR)
    if is_sr:
        ups = [conv_w(p[f"upconv_{i}"]) for i in range(model.num_upsample)]
        w_hr, b_hr = conv_w(p["HRconv"])
    w_last, b_last = conv_w(p["conv_last"])

    def _conv(x, w, b):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return (
            jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn
            )
            + b
        )

    @jax.jit
    def forward(x):
        x = x.astype(dtype)
        fea = _conv(x, w_first, b_first)
        t = s2d(fea)
        bi = 0
        for _ in range(n_blocks):
            r_in = t
            for _ in range(3):
                t = dense_block_pallas(
                    t, *s2d_blocks[bi], tile=tile, interpret=interpret
                )
                bi += 1
            t = t * 0.2 + r_in  # RRDB residual (rrdb_blocks.py:66-70)
        t = d2s(t)
        fea = fea + _conv(t, w_tc, b_tc)
        if is_sr:
            from ..models.rrdb import pixel_shuffle

            for w_up, b_up in ups:
                fea = _conv(fea, w_up, b_up)
                fea = jnp.where(fea >= 0, fea, 0.01 * fea)
                fea = pixel_shuffle(fea, 2)
            fea = _conv(fea, w_hr, b_hr)
            fea = jnp.where(fea >= 0, fea, 0.2 * fea)
            out = _conv(fea, w_last, b_last)
        else:
            out = _conv(fea, w_last, b_last) + x
        return jnp.clip(out, 0.0, 1.0)

    return forward
