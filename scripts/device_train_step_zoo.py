"""Transformer-zoo training-step timing on device (SwinIR production config).

The reference trains its transformers through Lightning with FSDP wrap
policies (train.py:141-155); here the generic shard_map DP step handles
them. Measures one-chip ms/step at 416->832, batch 1, remat on.

Usage: python scripts/device_train_step_zoo.py [model] [batch] [steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

from xmm_superres_denoise_tpu.config.schema import LossCfg
from xmm_superres_denoise_tpu.train import TrainState, create_loss

MODEL = sys.argv[1] if len(sys.argv) > 1 else "swinir"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
# optional 4th arg "bf16": mixed-precision step (bf16 fwd/bwd, f32
# masters — the trainer's `precision="bf16"` contract) to halve the
# activation footprint; the lever that decides whether DRCT/HAT
# production-size training fits a single 16 GB chip.
BF16 = "bf16" in sys.argv[4:]
# "scan" (argv token): build DRCT/HAT with scan-compressed group stacks
# (scan_layers=True) — the graph-size fix for the remote-AOT compile cap
# that blocked their production-size train steps (docs/TRAINING.md).
SCAN = "scan" in sys.argv[4:]


def build(name: str):
    if name == "swinir":
        from xmm_superres_denoise_tpu.models.swinir import SwinIR

        return SwinIR(
            img_size=416, patch_size=1, in_chans=1, embed_dim=180,
            depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
            mlp_ratio=2.0, upscale=2, upsampler="pixelshuffle",
            use_checkpoint=True,
        )
    if name == "swinfir":
        from xmm_superres_denoise_tpu.models.swinir import SwinFIR

        return SwinFIR(
            img_size=416, patch_size=1, in_chans=1, embed_dim=180,
            depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
            mlp_ratio=2.0, upscale=2, upsampler="pixelshuffle",
            use_checkpoint=True,
        )
    if name == "restormer":
        from xmm_superres_denoise_tpu.models.restormer import Restormer

        return Restormer(inp_channels=1, out_channels=1, dim=24)
    if name == "drct":
        from xmm_superres_denoise_tpu.models.drct import DRCT

        return DRCT(
            img_size=416, patch_size=1, in_chans=1, embed_dim=180,
            depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
            mlp_ratio=2.0, upscale=2, upsampler="pixelshuffle", gc=32,
            use_checkpoint=True, scan_layers=SCAN,
        )
    if name == "hat":
        from xmm_superres_denoise_tpu.models.hat import HAT

        return HAT(
            img_size=416, patch_size=1, in_chans=1, embed_dim=180,
            depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
            mlp_ratio=2.0, upscale=2, upsampler="pixelshuffle",
            use_checkpoint=True, scan_layers=SCAN,
        )
    raise SystemExit(f"unknown model {name}")


def main() -> None:
    from xmm_superres_denoise_tpu.utils.jitcache import apply_cache_config

    apply_cache_config()
    print("devices:", jax.devices(), flush=True)
    model = build(MODEL)
    g = np.random.default_rng(0)
    lr = jnp.asarray(g.uniform(0, 1, (BATCH, 416, 416, 1)), jnp.float32)
    hr_mult = 2 if MODEL != "restormer" else 1
    hr = jnp.asarray(
        g.uniform(0, 1, (BATCH, 416 * hr_mult, 416 * hr_mult, 1)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), lr[:1])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{MODEL}: {n_params/1e6:.1f}M params", flush=True)
    loss_fn = create_loss(None, LossCfg(psnr=0.5, ssim=0.5))
    tx = optax.adam(2e-4)
    state = TrainState.create(params, tx)

    @jax.jit
    def steps_fn(state, lr, hr):
        def one(state, _):
            def loss(p):
                x = lr
                if BF16:
                    from xmm_superres_denoise_tpu.train.steps import (
                        _cast_floating,
                    )

                    p = _cast_floating(p, jnp.bfloat16)
                    x = lr.astype(jnp.bfloat16)
                pred = jnp.clip(
                    model.apply(p, x).astype(jnp.float32), 0.0, 1.0
                )
                return loss_fn(pred, hr)

            l, grads = jax.value_and_grad(loss)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, new_params, opt_state), l

        state, losses = jax.lax.scan(one, state, None, length=STEPS)
        return state, jnp.sum(losses)

    t0 = time.perf_counter()
    _, l = steps_fn(state, lr, hr)
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s "
          f"(loss {float(l)/STEPS:.4f})", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, l = steps_fn(state, lr, hr)
        float(l)
        best = min(best, time.perf_counter() - t0)
    print(f"{MODEL} train: {best / STEPS * 1e3:.0f} ms/step "
          f"(batch {BATCH}, remat)", flush=True)


if __name__ == "__main__":
    main()
