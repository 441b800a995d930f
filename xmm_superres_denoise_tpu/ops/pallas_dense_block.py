"""Fused ResidualDenseBlock5C kernel v2 (S2D domain) — relayout-free taps.

Round-2 successor to ops/pallas_rrdb.py, built from the tap scheme validated
ON DEVICE this round (docs/PERFORMANCE.md "Pallas reconnaissance"):

  * the whole 5-conv dense block runs per (batch, H-strip, W-tile) grid cell
    with the growing concat buffer VMEM-resident — the XLA graph's concat
    materialization (~12 GB of HBM r+w per RDB at batch 32, the measured
    bottleneck of the S2D pipeline) never touches HBM;
  * dh (row) taps are FREE leading-dimension slices of the (rows, W, C)
    buffers — no relayout;
  * dw (column) taps are `pltpu.roll` on f32 (supported; bf16 roll is not),
    with wrapped columns contained in the halo margin;
  * every matmul is a (M, k*128) x (k*128, 128) MXU dot with f32
    accumulation;
  * SAME-conv zero padding at the true image boundary is reproduced by
    masking each level's output outside the global image box; ring garbage
    from VALID-size shrinkage stays inside the 5-deep margins and is never
    consumed by retained outputs.

Geometry: input (B, H, W, C) with H % h_strip == 0, W % w_tile == 0; the
wrapper pads H/W by (MH, MW) = (5 rows of halo rounded into leading-dim
reads, 8 cols for sublane-aligned DMA offsets).

ON-DEVICE RESULT (v5e, scripts/device_check_dense_block.py): compiles and
runs bit-close to the XLA gather graph (rel err 0.46% in bf16), sustaining
~177 TF/s inside the kernel — but the 5-deep halo forces a 1.875x tap
recompute at the (16, 104) tile, and XLA's own conv emitter already runs
the same block at ~184 TF/s (93% of the chip's 197 TF/s bf16 peak, RTT-
corrected). Net: fusion cannot beat XLA here; the chip is compute-bound and
the remaining lever is FLOP reduction (int8 MXU path / Winograd), not
HBM-traffic elimination. Kept as a validated scaffold for a Winograd-in-
VMEM variant.
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
MW = 8  # W margin (sublane-aligned DMA offsets need multiples of 8)
MH = 5  # H margin (leading dim: any offset is fine)


def _roll_variants(x32: Array, wb: int):
    """(x[w-1], x[w], x[w+1]) column-tap variants of a (rows, wb, c) f32
    value, wrapped columns zeroed."""
    col = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
    vm = pltpu.roll(x32, 1, axis=1)
    vm = jnp.where(col == 0, 0.0, vm)
    vp = pltpu.roll(x32, wb - 1, axis=1)
    vp = jnp.where(col == wb - 1, 0.0, vp)
    return (vm, x32, vp)


def _make_kernel(
    h_strip: int, w_tile: int, h_img: int, w_img: int, c: int, dtype
):
    rows = h_strip + 2 * MH
    wb = w_tile + 2 * MW
    out_rows = rows - 2  # per-level VALID rows, re-embedded with a zero ring

    def kernel(x_hbm, w1, w2, w3, w4, w5, biases, out_ref):
        ws = (w1, w2, w3, w4, w5)
        b = pl.program_id(0)
        hi = pl.program_id(1)
        ti = pl.program_id(2)
        # padded-array coordinates: true image occupies rows [MH+? ...) —
        # the wrapper pads H by MH+? see `dense_block_s2d_pallas`: H padded
        # by MH top/bottom is NOT 8-aligned for W but H is leading: fine.
        row0 = hi * h_strip  # strip start in the PADDED array
        col0 = ti * w_tile

        def body(X, CAT, sem):
            copy = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(row0, rows), pl.ds(col0, wb), :], X, sem
            )
            copy.start()
            copy.wait()

            # global (unpadded-image) coordinates of local positions
            lrow = jax.lax.broadcasted_iota(jnp.int32, (rows, wb, c), 0)
            lcol = jax.lax.broadcasted_iota(jnp.int32, (rows, wb, c), 1)
            grow = lrow + row0 - MH
            gcol = lcol + col0 - MW
            in_img = (
                (grow >= 0) & (grow < h_img) & (gcol >= 0) & (gcol < w_img)
            )
            in_img_mid = in_img[1 : rows - 1]

            x0 = jnp.where(in_img, X[:], jnp.zeros((), dtype))
            CAT[:, :, :c] = x0

            for level in range(5):
                k = level + 1
                acc = jnp.zeros((out_rows * wb, c), jnp.float32)
                for j in range(k):
                    chunk = CAT[:, :, j * c : (j + 1) * c].astype(jnp.float32)
                    for dw, var in enumerate(_roll_variants(chunk, wb)):
                        vb = var.astype(dtype)
                        for dh in range(3):
                            a = vb[dh : dh + out_rows].reshape(
                                out_rows * wb, c
                            )
                            acc = acc + jax.lax.dot_general(
                                a,
                                ws[level][dh, dw, j * c : (j + 1) * c, :],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                acc = acc.reshape(out_rows, wb, c)
                acc = acc + biases[0, level * c : (level + 1) * c].astype(
                    jnp.float32
                )
                if level < 4:
                    lvl = jnp.where(acc >= 0, acc, 0.2 * acc)
                    # re-embed VALID rows at [1, rows-1) with a zero ring and
                    # mask outside the true image (SAME-conv zero padding)
                    lvl = jnp.where(in_img_mid, lvl, 0.0)
                    CAT[:, :, k * c : (k + 1) * c] = jnp.zeros(
                        (rows, wb, c), dtype
                    )
                    CAT[1 : rows - 1, :, k * c : (k + 1) * c] = lvl.astype(
                        dtype
                    )
                else:
                    # out rows [MH, MH+h_strip) of the full tile = acc rows
                    # [MH-1, MH-1+h_strip) (acc row r <-> full row r+1)
                    x5 = acc[MH - 1 : MH - 1 + h_strip, MW : MW + w_tile, :]
                    xc = x0[MH : MH + h_strip, MW : MW + w_tile, :].astype(
                        jnp.float32
                    )
                    out_ref[0] = (x5 * 0.2 + xc).astype(dtype)

        pl.run_scoped(
            body,
            X=pltpu.VMEM((rows, wb, c), dtype),
            CAT=pltpu.VMEM((rows, wb, 5 * c), dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel, rows, wb


@partial(
    jax.jit,
    static_argnames=("h_strip", "w_tile", "interpret"),
)
def dense_block_s2d_pallas(
    x: Array,  # (B, H, W, C), C = 128 in the S2D production domain
    weights: Tuple[Array, ...],  # w_k (3, 3, k*C, C), k = 1..5
    biases: Tuple[Array, ...],  # b_k (C,)
    h_strip: int = 16,
    w_tile: int = 104,
    interpret: bool = False,
) -> Array:
    """Fused dense block: exact vs the gather-form XLA graph (bf16 dot
    accumulation in f32 both ways)."""
    bsz, h, w, c = x.shape
    assert h % h_strip == 0 and w % w_tile == 0, (h, w, h_strip, w_tile)
    dtype = x.dtype

    kernel, rows, wb = _make_kernel(h_strip, w_tile, h, w, c, dtype)

    xp = jnp.pad(x, ((0, 0), (MH, MH), (MW, MW), (0, 0)))
    bias_pack = jnp.zeros((8, 5 * c), dtype)
    for k, bk in enumerate(biases):
        bias_pack = bias_pack.at[0, k * c : (k + 1) * c].set(
            bk.astype(dtype)
        )

    grid = (bsz, h // h_strip, w // w_tile)
    # Mosaic stack-allocates the unrolled tap/roll intermediates without
    # reuse (~35 MB at the production tile), far over the 16 MB scoped-VMEM
    # compiler default — but well within v5e's physical VMEM. Raise the
    # per-kernel limit instead of shrinking tiles (smaller tiles inflate the
    # 5-deep halo recompute factor).
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: manual halo DMA
            *(
                pl.BlockSpec(memory_space=pltpu.VMEM)
                for _ in range(5)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
        ],
        out_specs=pl.BlockSpec(
            (1, h_strip, w_tile, c),
            lambda b, i, t: (b, i, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), dtype),
        interpret=interpret,
    )(xp, *[w.astype(dtype) for w in weights], bias_pack)
