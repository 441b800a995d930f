"""Hardware calibration probes with airtight data dependencies.

Every chained iteration consumes the FULL previous result (the next input is
a function of the whole output tensor), so XLA cannot dead-code-eliminate any
part of the computation. An earlier revision consumed only out[0,0], which
let XLA slice through dot/elementwise ops and report impossible rates
(817 "TF/s" bf16 on a 197 TF/s-peak v5e).

Measures: per-iteration loop overhead, HBM copy bandwidth, bf16 matmul peak,
and conv throughput at the model's shapes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

CHAIN = 20


def timed(f, *args):
    """f must return a SCALAR (full reduction of the chained result) —
    block_until_ready does not await on this runtime, so the only reliable
    completion signal is a host readback of a value that depends on all of
    the work."""
    float(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main() -> None:
    print("devices:", jax.devices(), flush=True)

    # --- loop overhead: near-empty body over a tiny carry --- #
    @jax.jit
    def empty(v):
        return lax.fori_loop(
            0, CHAIN, lambda i, v: v * 1.0000001 + 1e-9, v
        )

    t = timed(empty, jnp.float32(1.0))
    print(f"empty chain: {t * 1e6:.1f} us/iter", flush=True)

    # --- HBM bandwidth: full 256 MB carry read+written every iteration --- #
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64 * 1024 * 1024,)),
                    jnp.float32)

    @jax.jit
    def bw(x):
        out = lax.fori_loop(
            0, CHAIN, lambda i, v: v * 1.0000001 + 1e-9, x
        )
        return jnp.sum(out)

    t = timed(bw, x)
    print(f"copy 256MB r+w: {t * 1e3:.2f} ms -> {512e6 / t / 1e9:.0f} GB/s",
          flush=True)

    # --- bf16 matmul peak: next operand depends on the FULL product --- #
    a = jnp.asarray(np.random.default_rng(1).normal(size=(8192, 8192)) * 0.01,
                    jnp.bfloat16)

    @jax.jit
    def mm(a):
        def body(i, b):
            c = jax.lax.dot(b, a, preferred_element_type=jnp.float32)
            return (c * 1e-4).astype(jnp.bfloat16)

        return jnp.sum(
            lax.fori_loop(0, CHAIN, body, a).astype(jnp.float32)
        )

    t = timed(mm, a)
    fl = 2 * 8192**3
    print(f"8192^3 bf16 matmul: {t * 1e3:.2f} ms -> {fl / t / 1e12:.0f} TF/s",
          flush=True)

    # --- conv throughput: output feeds the next input in full --- #
    for batch, ch, hw in [(1, 32, 416), (8, 32, 416), (8, 128, 208),
                          (32, 128, 208), (8, 512, 208)]:
        xx = jnp.asarray(
            np.random.default_rng(2).normal(size=(batch, hw, hw, ch)) * 0.1,
            jnp.bfloat16,
        )
        w = jnp.asarray(
            np.random.default_rng(3).normal(size=(3, 3, ch, ch)) * 0.02,
            jnp.bfloat16,
        )

        @jax.jit
        def cv(xx, w):
            dn = lax.conv_dimension_numbers(
                xx.shape, w.shape, ("NHWC", "HWIO", "NHWC")
            )

            def body(i, v):
                y = lax.conv_general_dilated(
                    v, w, (1, 1), "SAME", dimension_numbers=dn
                )
                return y * 0.1

            return jnp.sum(
                lax.fori_loop(0, CHAIN, body, xx).astype(jnp.float32)
            )

        t = timed(cv, xx, w)
        fl = 2 * 9 * ch * ch * hw * hw * batch
        by = 2 * 2 * batch * hw * hw * ch  # bf16 r+w
        print(
            f"conv {ch}->{ch} @{hw}^2 b{batch}: {t * 1e3:.2f} ms "
            f"({fl / t / 1e12:.1f} TF/s, {by / t / 1e9:.0f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
