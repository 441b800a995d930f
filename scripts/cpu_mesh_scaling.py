"""Multi-chip scaling SHAPE on the virtual CPU mesh (VERDICT r3 #6 / task 5).

Real multi-chip TPU hardware is unavailable in this environment, so this
measures the *overhead shape* of the two sharded paths on XLA's host-platform
device virtualization (the same fabric the correctness suites use,
tests/conftest.py):

  * serving: the GSPMD data-sharded jitted forward (the InferenceEngine
    placement, infer/run_file.py:199-209),
  * training: the shard_map DP step with psum gradient reduction
    (train/steps.make_train_step).

The box has ONE physical core, so the n virtual devices execute serially
and the IDEAL weak-scaling time at n devices is n x t(1). The quantity
recorded is therefore

    overhead(n) = t(n) / (n * t(1))   (1.0 = perfectly linear shape)

— everything above 1.0 is sharding machinery: GSPMD partitioning passes,
per-device dispatch, and the psum all-reduce (the only cross-device
collective in either path; its payload is the gradient pytree for training
and nothing for serving, which is embarrassingly parallel over the batch
axis). On real ICI-connected chips the compute term parallelizes and the
collective term rides a ~100 GB/s+ ring, so the CPU overhead shape is a
conservative upper bound on the non-linear term.

Writes docs/mesh_scaling.json and prints a markdown table for
docs/PERFORMANCE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
import optax

PER_DEV_BATCH = 1
RES = 208  # serving spatial (half production)
TRAIN_RES = 104  # fwd+bwd on one core: quarter spatial keeps the sweep bounded
REPS = 2


def _time(fn, *args):
    jax.block_until_ready(fn(*args))  # compile + warm, fully drained
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def serving_time(n_dev: int) -> float:
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR

    model = GeneratorRRDB_SR(
        num_filters=32, num_res_blocks=4, num_upsample=1
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 1)))
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(
            0, 1, (n_dev * PER_DEV_BATCH, RES, RES, 1)
        ),
        jnp.float32,
    )
    x = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(p, x):
        return jnp.clip(model.apply(p, x), 0.0, 1.0)

    return _time(fwd, params, x)


def train_time(n_dev: int) -> float:
    from jax.sharding import Mesh

    from xmm_superres_denoise_tpu.config.schema import LossCfg
    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR
    from xmm_superres_denoise_tpu.parallel import replicate, shard_batch
    from xmm_superres_denoise_tpu.train import (
        TrainState,
        create_loss,
        make_train_step,
    )

    model = GeneratorRRDB_SR(
        num_filters=32, num_res_blocks=4, num_upsample=1
    )
    loss_fn = create_loss(None, LossCfg(l1=1.0))
    tx = optax.adam(1e-4)

    def apply_fn(p, x):
        return jnp.clip(model.apply(p, x), 0.0, 1.0)

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    step = make_train_step(apply_fn, loss_fn, tx, mesh, donate=False)
    g = np.random.default_rng(0)
    lr = jnp.asarray(
        g.uniform(0, 1, (n_dev * PER_DEV_BATCH, TRAIN_RES, TRAIN_RES, 1)),
        jnp.float32,
    )
    hr = jnp.asarray(
        g.uniform(
            0, 1, (n_dev * PER_DEV_BATCH, 2 * TRAIN_RES, 2 * TRAIN_RES, 1)
        ),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), lr[:1])
    state = replicate(mesh, TrainState.create(params, tx))
    batch = shard_batch(mesh, {"lr": lr, "hr": hr})

    def run(state, batch):
        s2, loss = step(state, batch)
        return loss

    return _time(run, state, batch)


def main() -> None:
    table = {"per_dev_batch": PER_DEV_BATCH, "serving_res": RES, "train_res": TRAIN_RES, "serving": {},
             "train": {}}
    for kind, fn in (("serving", serving_time), ("train", train_time)):
        t1 = None
        for n in (1, 2, 4, 8):
            t = fn(n)
            if t1 is None:
                t1 = t
            table[kind][str(n)] = {
                "s_per_step": round(t, 4),
                "overhead_vs_linear": round(t / (n * t1), 4),
            }
            print(f"{kind} n={n}: {t:.3f}s overhead={t / (n * t1):.3f}",
                  flush=True)
    out = REPO / "docs" / "mesh_scaling.json"
    out.write_text(json.dumps(table, indent=2))
    print(f"wrote {out}")

    print("\n| devices | serving overhead | train overhead |")
    print("|---|---|---|")
    for n in (1, 2, 4, 8):
        print(
            f"| {n} | {table['serving'][str(n)]['overhead_vs_linear']:.3f} "
            f"| {table['train'][str(n)]['overhead_vs_linear']:.3f} |"
        )


if __name__ == "__main__":
    main()
