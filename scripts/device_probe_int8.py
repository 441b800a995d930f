"""Probe: does int8 conv hit the v5e MXU's 394 TOPS on this runtime?

Chains convs with full data dependency (requantize between iterations) and
reports TOP/s at the S2D production shapes. RTT note: each timed call pays
one ~29 ms host-readback RTT; CHAIN=40 keeps that under 2% of the total.
"""

from __future__ import annotations

import sys
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

    for batch, ch, hw in [(8, 128, 208), (32, 128, 208)]:
        x8 = jnp.asarray(
            g.integers(-100, 100, size=(batch, hw, hw, ch)), jnp.int8
        )
        w8 = jnp.asarray(g.integers(-100, 100, size=(3, 3, ch, ch)), jnp.int8)
        xb = x8.astype(jnp.bfloat16) * 0.01
        wb = w8.astype(jnp.bfloat16) * 0.01

        dn = lax.conv_dimension_numbers(
            x8.shape, w8.shape, ("NHWC", "HWIO", "NHWC")
        )

        @jax.jit
        def cv8(x, w):
            def body(i, v):
                y = lax.conv_general_dilated(
                    v, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                # requantize: full dependency, keeps int8 domain
                return (y >> 7).astype(jnp.int8)

            out = lax.fori_loop(0, CHAIN, body, x)
            return jnp.sum(out.astype(jnp.float32))

        @jax.jit
        def cvb(x, w):
            def body(i, v):
                y = lax.conv_general_dilated(
                    v, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
                return (y * 0.1).astype(jnp.bfloat16)

            out = lax.fori_loop(0, CHAIN, body, x)
            return jnp.sum(out.astype(jnp.float32))

        fl = 2 * 9 * ch * ch * hw * hw * batch
        try:
            t8 = timed(cv8, x8, w8)
            print(f"int8 conv {ch} @{hw}^2 b{batch}: {t8 * 1e3:.2f} ms "
                  f"({fl / t8 / 1e12:.0f} TOP/s)", flush=True)
        except Exception as e:
            print(f"int8 conv b{batch} FAILED: {str(e)[:300]}", flush=True)
        tb = timed(cvb, xb, wb)
        print(f"bf16 conv {ch} @{hw}^2 b{batch}: {tb * 1e3:.2f} ms "
              f"({fl / tb / 1e12:.0f} TF/s)", flush=True)

    # int8 matmul peak for reference
    a8 = jnp.asarray(g.integers(-100, 100, size=(8192, 8192)), jnp.int8)

    @jax.jit
    def mm8(a):
        def body(i, b):
            c = jax.lax.dot(b, a, preferred_element_type=jnp.int32)
            return (c >> 14).astype(jnp.int8)

        return jnp.sum(lax.fori_loop(0, CHAIN, body, a).astype(jnp.float32))

    try:
        t = timed(mm8, a8)
        print(f"8192^3 int8 matmul: {t * 1e3:.2f} ms "
              f"({2 * 8192**3 / t / 1e12:.0f} TOP/s)", flush=True)
    except Exception as e:
        print(f"int8 matmul FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
