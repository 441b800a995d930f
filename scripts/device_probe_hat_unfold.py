"""Probe: is HAT's OCAB unfold (conv_general_dilated_patches) the 3 s/img
bottleneck? Times the unfold alone, an attention-shaped einsum pair, and a
CAB-shaped conv at HAT production sizes (416^2, 180ch)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from xmm_superres_denoise_tpu.models.hat import unfold_overlap_windows

CHAIN = 10


def timed(f, *args):
    float(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    g = np.random.default_rng(0)
    c = 360  # kv channels (2*180)
    x = jnp.asarray(g.normal(size=(1, 416, 416, c)) * 0.1, jnp.bfloat16)

    @jax.jit
    def unfold_chain(x):
        def body(i, v):
            p = unfold_overlap_windows(v, 16, 24)  # (676, 576, 360)
            # fold back to keep shapes: mean over the patch dim -> broadcast
            r = jnp.mean(p.astype(jnp.float32)) * 1e-6
            return v * (1.0 + r.astype(v.dtype))

        return jnp.sum(lax.fori_loop(0, CHAIN, body, x).astype(jnp.float32))

    t = timed(unfold_chain, x)
    print(f"OCAB unfold (416^2, 360ch): {t * 1e3:.2f} ms/op", flush=True)

    # window-attention einsum pair at HAT production shape
    nw, nh, n, d = 676, 6, 256, 30
    q = jnp.asarray(g.normal(size=(nw, nh, n, d)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(g.normal(size=(nw, nh, n, d)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(g.normal(size=(nw, nh, n, d)) * 0.1, jnp.bfloat16)

    @jax.jit
    def attn_chain(q, k, v):
        def body(i, qq):
            a = jnp.einsum("bhnd,bhmd->bhnm", qq, k,
                           preferred_element_type=jnp.float32)
            a = jax.nn.softmax(a, axis=-1).astype(qq.dtype)
            o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
            return o * 0.5 + qq * 0.5

        return jnp.sum(lax.fori_loop(0, CHAIN, body, q).astype(jnp.float32))

    t = timed(attn_chain, q, k, v)
    print(f"window attention block (676w x 6h x 256 x 30): {t * 1e3:.2f} ms",
          flush=True)

    # CAB conv pair 180 -> 60 -> 180 at 416^2
    xc = jnp.asarray(g.normal(size=(1, 416, 416, 180)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(g.normal(size=(3, 3, 180, 60)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(g.normal(size=(3, 3, 60, 180)) * 0.05, jnp.bfloat16)

    @jax.jit
    def cab_chain(xc, w1, w2):
        dn1 = lax.conv_dimension_numbers(xc.shape, w1.shape,
                                         ("NHWC", "HWIO", "NHWC"))

        def body(i, v):
            h = lax.conv_general_dilated(v, w1, (1, 1), "SAME",
                                         dimension_numbers=dn1)
            dn2 = lax.conv_dimension_numbers(h.shape, w2.shape,
                                             ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(h, w2, (1, 1), "SAME",
                                         dimension_numbers=dn2)
            return y * 0.1 + v * 0.9

        return jnp.sum(lax.fori_loop(0, CHAIN, body, xc).astype(jnp.float32))

    t = timed(cab_chain, xc, w1, w2)
    print(f"CAB conv pair (416^2, 180->60->180): {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
