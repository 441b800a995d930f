"""Go/no-go probe for a Winograd-int8 fused kernel: does Mosaic lower
s8 x s8 -> s32 dot_general inside a Pallas TPU kernel, and at what rate?

Kernel: per grid cell, an (M, K) x (K, N) int8 matmul with int32
accumulation, M=2048 K=N=128 — the shape class the fused dense block uses.
Compares against the XLA int8 dot on the same data.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 2048, 128, 128
CHAIN = 40


def kernel(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    o_ref[...] = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    g = np.random.default_rng(0)
    a = jnp.asarray(g.integers(-100, 100, (M, K)), jnp.int8)
    b = jnp.asarray(g.integers(-100, 100, (K, N)), jnp.int8)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        got = np.asarray(jax.jit(f)(a, b))
        ref = np.asarray(
            jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )
        ok = np.array_equal(got, ref)
        print(f"pallas int8 dot: compiles, exact={ok}", flush=True)
    except Exception as e:
        print(f"pallas int8 dot FAILED: {str(e)[:500]}", flush=True)
        return

    # rate: chained kernel with requantize between iterations
    def chain(x):
        def body(i, v):
            y = f(v, b)
            return (y >> 7).astype(jnp.int8)

        return jnp.sum(lax.fori_loop(0, CHAIN, body, x).astype(jnp.float32))

    cf = jax.jit(chain)
    float(cf(a))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(cf(a))
        best = min(best, time.perf_counter() - t0)
    per = best / CHAIN
    print(
        f"pallas int8 dot: {per * 1e3:.3f} ms/iter "
        f"({2 * M * K * N / per / 1e12:.1f} TOP/s incl. requant+RTT/CHAIN)",
        flush=True,
    )


if __name__ == "__main__":
    main()
