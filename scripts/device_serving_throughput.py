"""E2E serving throughput of InferenceEngine.predict_tiles on the real chip.

Measures wall-clock tiles/s for a stack of production tiles INCLUDING
host->device upload, device->host readback of the 832^2 predictions, and
the per-execution relay cost — the number a serving deployment actually
sees, unlike bench.py's pure device-side chain.

Compares the pipelined drain (up to 2 chunks in flight, round 3) against
a serialized variant (np.asarray per chunk) to quantify the async-dispatch
overlap win.

Measured batch regime (late round 3, 16 GB v5e): int8 b32 runs (6.0
tiles/s e2e, relay-bound); b64 and b128 RESOURCE_EXHAUST with the two
in-flight chunks + full-res readback footprint, even though bench.py's
pure device-side chain reaches b128. The serve knee is b32.

Usage: python scripts/device_serving_throughput.py [n_tiles] [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from xmm_superres_denoise_tpu.config.schema import (
    DatasetCfg,
    HrDatasetCfg,
    LrDatasetCfg,
    ModelCfg,
    OptimizerCfg,
    RrdbCfg,
)
from xmm_superres_denoise_tpu.infer.run_file import InferenceEngine
from xmm_superres_denoise_tpu.models.registry import build_model

N_TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 96
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    import jax
    import jax.numpy as jnp

    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=416),
        hr=HrDatasetCfg(exp=100, clamp_max=0.0057, res=832),
        scaling="sqrt",
        type="boring",
    )
    mc = ModelCfg(
        name="esr_gen", memory_efficient=False, batch_size=BATCH,
        model=RrdbCfg(base_model="esr_gen", filters=32, residual_blocks=4),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    model = build_model(mc, (416, 416), (832, 832))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 1)))

    g = np.random.default_rng(0)
    stack = g.uniform(0, 0.002, (N_TILES, 416, 416)).astype(np.float32)

    eng = InferenceEngine(mc, ds, params, dtype=jnp.bfloat16,
                          quantize=True)

    # Warm: compile + first-touch (excluded from timing).
    eng.predict_tiles(stack[: 2 * BATCH], batch_size=BATCH)

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            assert out.shape == (N_TILES, 832, 832), out.shape
            best = min(best, dt)
        return best

    # Serialized reference: same chunking, drain after every dispatch.
    def serial() -> np.ndarray:
        outs = []
        for i in range(0, N_TILES, BATCH):
            chunk = stack[i : i + BATCH]
            k = chunk.shape[0]
            if k < BATCH:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], BATCH - k, axis=0)], axis=0
                )
            cj = jnp.asarray(chunk, jnp.float32)
            eng._ensure_built(cj)
            cj, _ = eng._place(cj)
            outs.append(np.asarray(eng._run_pred(eng.params, cj))[:k])
        return np.concatenate(outs, axis=0)

    t_serial = timed(serial)
    t_pipe = timed(lambda: eng.predict_tiles(stack, batch_size=BATCH))
    t_serial2 = timed(serial)

    print(f"serial re-check: {t_serial2:.3f} s")
    print(
        f"predict_tiles int8 b{BATCH} x {N_TILES} tiles: "
        f"pipelined {N_TILES / t_pipe:.1f} tiles/s ({t_pipe:.3f} s), "
        f"serialized {N_TILES / t_serial:.1f} tiles/s ({t_serial:.3f} s), "
        f"overlap win {t_serial / t_pipe:.2f}x"
    )


if __name__ == "__main__":
    main()
