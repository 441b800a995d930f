"""Benchmark: 416->832 SR tiles/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >=500 tiles/sec (BASELINE.md), vs_baseline = value / 500.

Measures the flagship inference path: jitted GeneratorRRDB_SR forward
(production config: 32 filters x 4 RRDB blocks, 416^2 -> 832^2) in bf16.

Timing note: the dev TPU is reached through a network tunnel where
`block_until_ready` does not reliably await remote completion and every
host readback pays a large RTT. The benchmark therefore chains N forwards
inside ONE jitted fori_loop with a data dependency between iterations
(preventing hoisting/elision) and times a single scalar readback — so the
measured window is pure device time plus one RTT, amortized over N*batch
tiles.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BASELINE_TILES_PER_SEC = 500.0


def main() -> None:
    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR

    model = GeneratorRRDB_SR(
        in_channels=1, out_channels=1, num_filters=32, num_res_blocks=4,
        num_upsample=1,
    )

    batch = 8
    chain = 10
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, 416, 416, 1)), jnp.bfloat16
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 1)))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def bench_fn(p, x):
        def body(i, acc):
            y = model.apply(p, x + acc * 1e-20)  # dependency: no hoisting
            return acc + jnp.sum(y.astype(jnp.float32)) * 1e-20

        return lax.fori_loop(0, chain, body, jnp.float32(0.0))

    # compile + warm (full roundtrip)
    float(bench_fn(params, x))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_fn(params, x))
        best = min(best, time.perf_counter() - t0)

    tiles_per_sec = batch * chain / best
    print(
        json.dumps(
            {
                "metric": "sr_416to832_tiles_per_sec",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/s",
                "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
