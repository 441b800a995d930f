"""Probe: does the TPU backend lower int4 matmul/conv, and at what rate?

w4a8 would halve weight-side MXU work if int4 is native (v5e int4 is
2x int8 on paper). Chained with full data dependencies; subtract
RTT/CHAIN (~0.73 ms at CHAIN=40) when quoting.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

CHAIN = 40


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

    # int4 x int4 matmul
    try:
        a4 = jnp.asarray(g.integers(-7, 8, size=(8192, 8192)), jnp.int4)

        @jax.jit
        def mm4(a):
            def body(i, b):
                c = jax.lax.dot(b, a, preferred_element_type=jnp.int32)
                return (c >> 12).astype(jnp.int4)

            return jnp.sum(
                lax.fori_loop(0, CHAIN, body, a).astype(jnp.float32)
            )

        t = timed(mm4, a4)
        print(f"8192^3 int4 matmul: {t * 1e3:.2f} ms "
              f"({2 * 8192**3 / t / 1e12:.0f} TOP/s)", flush=True)
    except Exception as e:
        print(f"int4 matmul FAILED: {str(e)[:300]}", flush=True)

    # w4a8 conv: int8 activations x int4 weights
    try:
        x8 = jnp.asarray(g.integers(-100, 100, size=(8, 208, 208, 128)),
                         jnp.int8)
        w4 = jnp.asarray(g.integers(-7, 8, size=(3, 3, 128, 128)), jnp.int4)
        dn = lax.conv_dimension_numbers(
            x8.shape, w4.shape, ("NHWC", "HWIO", "NHWC")
        )

        @jax.jit
        def cv48(x, w):
            def body(i, v):
                y = lax.conv_general_dilated(
                    v, w.astype(jnp.int8), (1, 1), "SAME",
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                return (y >> 7).astype(jnp.int8)

            return jnp.sum(
                lax.fori_loop(0, CHAIN, body, x).astype(jnp.float32)
            )

        t = timed(cv48, x8, w4)
        fl = 2 * 9 * 128 * 128 * 208 * 208 * 8
        print(f"w4a8 conv (as int8): {t * 1e3:.2f} ms "
              f"({fl / t / 1e12:.0f} TOP/s)", flush=True)
    except Exception as e:
        print(f"w4a8 conv FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
