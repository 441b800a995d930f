"""Benchmark: 416->832 SR tiles/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >=500 tiles/sec (BASELINE.md), vs_baseline = value / 500.

Measures the flagship inference path (GeneratorRRDB_SR, production config:
32 filters x 4 RRDB blocks, 416^2 -> 832^2, bf16). Two candidate pipelines:

  * fused: the Pallas space-to-depth RRDB trunk
    (xmm_superres_denoise_tpu/ops/pallas_rrdb.py) — one kernel per dense
    block, 128-lane channels;
  * xla: the plain jitted Flax forward.

The faster (or the one that compiles) wins; the choice is reported on stderr.

Timing note: the dev TPU sits behind a network tunnel where
`block_until_ready` does not reliably await remote completion and every
host readback pays a large RTT. The benchmark therefore chains N forwards
inside ONE jitted fori_loop with a data dependency between iterations
(preventing hoisting/elision) and times a single scalar readback — the
measured window is device time plus one RTT, amortized over N*batch tiles.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BASELINE_TILES_PER_SEC = 500.0
BATCH = 8
CHAIN = 10


def _timed(forward, x) -> float:
    def chain(x):
        def body(i, acc):
            y = forward(x + acc.astype(x.dtype) * 1e-8)
            return acc + jnp.sum(y[:, :2, :2, :].astype(jnp.float32)) * 1e-24

        return lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    f = jax.jit(chain)
    float(f(x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return BATCH * CHAIN / best


def main() -> None:
    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR

    model = GeneratorRRDB_SR(
        in_channels=1, out_channels=1, num_filters=32, num_res_blocks=4,
        num_upsample=1,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 1)))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (BATCH, 416, 416, 1)), jnp.bfloat16
    )

    results = {}

    bf16_params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params
    )

    def xla_forward(x):
        return jnp.clip(model.apply(bf16_params, x), 0.0, 1.0)

    try:
        from xmm_superres_denoise_tpu.ops.pallas_rrdb import make_fast_rrdb_forward

        fused = make_fast_rrdb_forward(model, params, dtype=jnp.bfloat16)
        results["fused"] = _timed(fused, x)
    except Exception as e:  # pallas path unavailable on this backend
        print(f"bench: fused path failed ({type(e).__name__}: {e})", file=sys.stderr)

    try:
        results["xla"] = _timed(xla_forward, x)
    except Exception as e:
        print(f"bench: xla path failed ({type(e).__name__}: {e})", file=sys.stderr)

    if not results:
        raise SystemExit("no benchmark path succeeded")

    pipeline, tiles_per_sec = max(results.items(), key=lambda kv: kv[1])
    print(f"bench: {results} -> using {pipeline}", file=sys.stderr)
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
