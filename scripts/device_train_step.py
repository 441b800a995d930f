"""Training-step timing: plain Flax apply vs the S2D fast path, on device.

Production config: esr_gen 416->832, batch 2, memory_efficient (remat),
paper loss (0.5 PSNR + 0.5 MS-SSIM surrogate: here l1+psnr+ssim composite
from the registry), f32 params / bf16-free (training numerics).

Usage: python scripts/device_train_step.py [batch] [steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xmm_superres_denoise_tpu.config.schema import LossCfg
from xmm_superres_denoise_tpu.models.rrdb import GeneratorRRDB_SR
from xmm_superres_denoise_tpu.ops.s2d_forward import make_s2d_train_apply
from xmm_superres_denoise_tpu.train import TrainState, create_loss

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    model = GeneratorRRDB_SR(
        in_channels=1, out_channels=1, num_filters=32, num_res_blocks=4,
        num_upsample=1, memory_efficient=True,
    )
    g = np.random.default_rng(0)
    lr = jnp.asarray(g.uniform(0, 1, (BATCH, 416, 416, 1)), jnp.float32)
    hr = jnp.asarray(g.uniform(0, 1, (BATCH, 832, 832, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr[:1])
    loss_fn = create_loss(None, LossCfg(psnr=0.5, ssim=0.5))
    tx = optax.adam(1e-4)

    applies = {
        "plain+remat": lambda p, x: jnp.clip(model.apply(p, x), 0.0, 1.0),
        "s2d+remat": make_s2d_train_apply(model, remat=True),
    }
    # f32 vs bf16-mixed (trainer.precision="bf16": bf16 forward/backward,
    # f32 master params/loss/optimizer — train/steps.py contract)
    variants = [
        (name + suffix, apply_fn, dtype)
        for name, apply_fn in applies.items()
        for suffix, dtype in (("", None), ("+bf16", jnp.bfloat16))
    ]

    from xmm_superres_denoise_tpu.train.steps import _cast_floating

    for name, apply_fn, dtype in variants:
        state = TrainState.create(params, tx)

        @jax.jit
        def steps_fn(state, lr, hr):
            def one(state, _):
                def loss(p):
                    x = lr
                    if dtype is not None:
                        p = _cast_floating(p, dtype)
                        x = lr.astype(dtype)
                    return loss_fn(
                        apply_fn(p, x).astype(jnp.float32), hr
                    )

                l, grads = jax.value_and_grad(loss)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                new_params = optax.apply_updates(state.params, updates)
                return TrainState(state.step + 1, new_params, opt_state), l

            state, losses = jax.lax.scan(one, state, None, length=STEPS)
            return state, jnp.sum(losses)

        try:
            t0 = time.perf_counter()
            _, l = steps_fn(state, lr, hr)
            float(l)
            print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s",
                  flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _, l = steps_fn(state, lr, hr)
                float(l)
                best = min(best, time.perf_counter() - t0)
            print(
                f"{name}: {best / STEPS * 1e3:.0f} ms/step "
                f"({BATCH * STEPS / best:.2f} img/s) batch {BATCH}",
                flush=True,
            )
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
