"""Pallas TPU kernel: fused window-attention core.

The Swin zoo's hot op (SURVEY.md §5.7): window attention over 1000+ windows
of 169/256 tokens. The XLA graph materializes the (G, heads, N, N) attention
tensor in HBM twice (write after QK^T, read for softmax(..)@V) — ~350 MB per
block at production size (1024 windows x 6 heads x 169^2). This kernel fuses
the core

    softmax(q k^T * scale + rel-pos bias [+ shift mask]) @ v

per group of windows, keeping the N x N logits VMEM-resident; the qkv and
output projections stay as plain XLA GEMMs (they are single large matmuls
the MXU already handles well, and leaving them outside keeps the Flax
parameter tree untouched).

Used by `models.swin_common.WindowAttention` when XMMSR_PALLAS_ATTENTION=1
(or `set_pallas_attention(True)`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _attention_core_kernel(num_heads: int, scale: float, with_mask: bool):
    def kernel(qkv_ref, bias_ref, *rest):
        if with_mask:
            mask_ref, out_ref = rest
        else:
            (out_ref,) = rest

        gt, n, c3 = qkv_ref.shape
        c = c3 // 3
        nh = num_heads
        d = c // nh

        qkv = qkv_ref[:].reshape(gt, n, 3, nh, d)
        bias = bias_ref[:].astype(jnp.float32)  # (nh, n, n)
        dt = qkv_ref.dtype

        out = jnp.zeros((gt, n, nh, d), jnp.float32)
        for g in range(gt):
            for h in range(nh):
                q = qkv[g, :, 0, h, :] * jnp.asarray(scale, dt)
                k = qkv[g, :, 1, h, :]
                v = qkv[g, :, 2, h, :]
                attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
                attn = attn + bias[h]
                if with_mask:
                    attn = attn + mask_ref[g].astype(jnp.float32)
                attn = jax.nn.softmax(attn, axis=-1)
                ov = jnp.dot(
                    attn.astype(dt), v, preferred_element_type=jnp.float32
                )
                out = out.at[g, :, h, :].set(ov)

        out_ref[:] = out.astype(dt).reshape(gt, n, c)

    return kernel


@partial(jax.jit, static_argnames=("num_heads", "scale", "group", "interpret"))
def attention_core_pallas(
    qkv: Array,  # (G, N, 3C): fused q|k|v per token (qkv-projection output)
    bias: Array,  # (nH, N, N) relative-position bias (pre-gathered)
    mask: Optional[Array] = None,  # (nW, N, N) shifted-window mask
    *,
    num_heads: int,
    scale: float,
    group: int = 8,
    interpret: bool = False,
) -> Array:
    """Fused attention core over window groups -> (G, N, C).

    qkv layout matches the torch head split (models/swin_common.py): token
    features ordered (3, heads, head_dim) within the last axis. With a mask,
    windows must traverse image-major and nW must divide by `group`.
    """
    g_total, n, c3 = qkv.shape
    c = c3 // 3
    assert g_total % group == 0, (g_total, group)
    grid = (g_total // group,)

    in_specs = [
        pl.BlockSpec((group, n, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [qkv, bias]
    with_mask = mask is not None
    if with_mask:
        nw = mask.shape[0]
        assert nw % group == 0, (nw, group)
        blocks_per_image = nw // group
        in_specs.append(
            pl.BlockSpec(
                (group, n, n),
                lambda i: (i % blocks_per_image, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask)

    return pl.pallas_call(
        _attention_core_kernel(num_heads, scale, with_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (group, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g_total, n, c), qkv.dtype),
        interpret=interpret,
    )(*args)
