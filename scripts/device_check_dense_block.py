"""On-device validation + timing of the fused dense-block v2 kernel.

Runs on the real (tunneled) TPU chip:
  1. exactness vs the gather-form XLA dense block at a production-like shape;
  2. fori-chained timing (single scalar readback — the tunnel's
     block_until_ready is unreliable, see docs/PERFORMANCE.md) of fused vs
     XLA at the S2D production shape (B, 208, 208, 128).

Usage: python scripts/device_check_dense_block.py [batch] [h_strip] [w_tile]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from xmm_superres_denoise_tpu.ops.pallas_dense_block import (
    dense_block_s2d_pallas,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H_STRIP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
W_TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 104
CHAIN = 10


def _ref_dense_block(x, weights, biases):
    def conv(t, w, b):
        dn = lax.conv_dimension_numbers(
            t.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return lax.conv_general_dilated(
            t, w, (1, 1), "SAME", dimension_numbers=dn
        ) + b

    feats = [x]
    for lvl in range(4):
        h = conv(jnp.concatenate(feats, -1) if lvl else x,
                 weights[lvl], biases[lvl])
        feats.append(jnp.where(h >= 0, h, 0.2 * h))
    x5 = conv(jnp.concatenate(feats, -1), weights[4], biases[4])
    return x5 * 0.2 + x


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    c = 128
    g = np.random.default_rng(0)
    ws = tuple(
        jnp.asarray(g.normal(size=(3, 3, k * c, c)) * 0.05, jnp.bfloat16)
        for k in range(1, 6)
    )
    bs = tuple(
        jnp.asarray(g.normal(size=(c,)) * 0.05, jnp.bfloat16)
        for _ in range(5)
    )

    # --- 1. exactness at a small production-like shape --- #
    xs = jnp.asarray(g.normal(size=(1, 32, 208, c)) * 0.3, jnp.bfloat16)
    t0 = time.perf_counter()
    got = dense_block_s2d_pallas(xs, ws, bs, h_strip=H_STRIP, w_tile=W_TILE)
    got = np.asarray(got, np.float32)
    print(f"fused compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    ref = np.asarray(jax.jit(_ref_dense_block)(xs, ws, bs), np.float32)
    err = np.max(np.abs(got - ref))
    denom = max(np.max(np.abs(ref)), 1e-6)
    print(f"max abs err: {err:.6f}  (rel {err / denom:.6f})", flush=True)
    assert err / denom < 0.05, "fused kernel mismatch on device"
    print("EXACTNESS OK", flush=True)

    # --- 2. timing at the S2D production shape --- #
    x = jnp.asarray(
        g.normal(size=(BATCH, 208, 208, c)) * 0.3, jnp.bfloat16
    )

    def chain(fwd):
        def f(x):
            def body(i, acc):
                y = fwd(x + acc.astype(x.dtype) * 1e-8)
                # FULL reduction: a slice readback would let XLA narrow
                # ONLY the HLO reference (the Pallas call is opaque),
                # biasing the comparison toward "xla" (DCE trap,
                # device_calibrate.py).
                return acc + jnp.sum(y.astype(jnp.float32)) * 1e-24

            return lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

        return jax.jit(f)

    fused = chain(
        lambda t: dense_block_s2d_pallas(
            t, ws, bs, h_strip=H_STRIP, w_tile=W_TILE
        )
    )
    xla = chain(lambda t: _ref_dense_block(t, ws, bs))

    for name, fn in [("xla", xla), ("fused", fused)]:
        t0 = time.perf_counter()
        float(fn(x))
        print(f"{name} compile+warm: {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        ms = best / CHAIN * 1e3
        print(f"{name}: {ms:.2f} ms/block (batch {BATCH})", flush=True)


if __name__ == "__main__":
    main()
