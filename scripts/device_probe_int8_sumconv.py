"""Probe: concat-free int8 dense blocks + batch fine-sweep (VERDICT r4 #1).

Round-3 left the int8-b128 winner ~10% under its own 394-TOPS roofline and
the batch sweep jumped b128 -> b256-OOM. Round-4 measurements close both:

  * b144 OOMs by 3.28 MB (15.75G HBM cap) — so the fine sweep is b132/b136,
  * concat_free: each dense-level conv as a sum of per-group int8 convs
    (exactly equal int32 math, no concat materialization) — probes whether
    the int8 concat copies are bench-visible.

Usage: python scripts/device_probe_int8_sumconv.py [variant] [batch]
  variant: "concat" | "cfree"      (default both at batch from argv)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CHAIN = 10


def run(variant: str, batch: int) -> float:
    from xmm_superres_denoise_tpu.utils.jitcache import apply_cache_config

    apply_cache_config()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR
    from xmm_superres_denoise_tpu.ops.int8_forward import (
        make_int8_s2d_forward,
    )

    model = GeneratorRRDB_SR(
        in_channels=1, out_channels=1, num_filters=32, num_res_blocks=4,
        num_upsample=1,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 1)))
    calib = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (4, 416, 416, 1)), jnp.float32
    )
    forward = make_int8_s2d_forward(
        model, params, calib, dtype=jnp.bfloat16,
        concat_free=(variant == "cfree"),
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, 416, 416, 1)),
        jnp.bfloat16,
    )

    def chain_fn(x):
        def body(i, acc):
            y = forward(x + acc.astype(x.dtype) * 1e-8)
            return acc + jnp.sum(y[:, :2, :2, :].astype(jnp.float32)) * 1e-24

        return lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    f = jax.jit(chain_fn)
    t0 = time.perf_counter()
    float(f(x))
    print(f"{variant}-b{batch}: compile+warm {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    tps = batch * CHAIN / best
    print(f"{variant}-b{batch}: {tps:.1f} tiles/s", flush=True)
    return tps


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else None
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    if variant is not None and variant not in ("concat", "cfree"):
        # an A/B probe must not silently run the wrong arm: a lone batch
        # number or a typo here would poison the recorded sweep
        raise SystemExit(
            f"variant must be 'concat' or 'cfree', got {variant!r} "
            "(usage: device_probe_int8_sumconv.py [variant] [batch])"
        )
    if variant:
        run(variant, batch)
    else:
        for v in ("concat", "cfree"):
            run(v, batch)
