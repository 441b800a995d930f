"""Microbenchmark: per-conv cost scaling on the dev TPU (batch/channels/domain).

Timing pattern per docs/PERFORMANCE.md: chain K iterations inside one jitted
fori_loop with a data dependency, one scalar readback.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_conv(batch, hw, cin, cout, dtype=jnp.bfloat16, chain=20, reps=3):
    g = np.random.default_rng(0)
    x = jnp.asarray(g.uniform(-1, 1, (batch, hw, hw, cin)), dtype)
    w = jnp.asarray(g.uniform(-0.05, 0.05, (3, 3, cin, cout)), dtype)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def chain_fn(x, w):
        def body(i, carry):
            acc, x = carry
            y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
            # FULL reduction — consuming a slice lets XLA narrow the conv
            # to the consumed patch (the documented DCE trap,
            # device_calibrate.py): earlier revisions of this script read
            # y[:, :1, :1, :] and reported >peak TF/s.
            acc = acc + jnp.sum(y.astype(jnp.float32)) * 1e-20
            # feed a perturbed input back so iterations can't be elided/hoisted
            x2 = x + acc.astype(x.dtype) * 1e-9
            return acc, x2

        acc, _ = lax.fori_loop(0, chain, body, (jnp.float32(0.0), x))
        return acc

    f = jax.jit(chain_fn)
    float(f(x, w))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x, w))
        best = min(best, time.perf_counter() - t0)
    ms = best / chain * 1e3
    flops = 2 * batch * hw * hw * 9 * cin * cout
    print(
        f"conv b{batch:3d} {hw}^2 {cin:4d}->{cout:4d}: {ms:7.3f} ms/op  "
        f"{flops / (ms / 1e3) / 1e12:7.1f} TF/s",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "batch"):
        # batch scaling at the two key shapes
        for b in (1, 8, 32, 128):
            time_conv(b, 416, 32, 32)
        for b in (1, 8, 32, 64):
            time_conv(b, 208, 128, 128)
    if which in ("all", "chan"):
        time_conv(8, 416, 160, 32)
        time_conv(8, 208, 640, 128)
        time_conv(32, 208, 640, 128)
        time_conv(8, 208, 512, 512)
