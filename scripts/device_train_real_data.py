"""Short on-device training run on the REAL example sim data.

Demonstrates the full production training loop on TPU: sim-composite
dataset (img + AGN + background, detector mask, pad, sqrt stretch) ->
shard_map DP trainer with the S2D fast path -> paper loss -> orbax
checkpoints -> per-epoch metrics/history. Records epochs, loss
trajectory, and wall time.

Usage: python scripts/device_train_real_data.py [epochs] [filters] [blocks]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
FILTERS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
BLOCKS = int(sys.argv[3]) if len(sys.argv) > 3 else 4

EXAMPLE = Path("/root/reference/data/example_data/sim")


def main() -> None:
    import jax

    from xmm_superres_denoise_tpu.config.schema import (
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

    print("devices:", jax.devices(), flush=True)
    work = Path(tempfile.mkdtemp(prefix="xmmsr_train_"))
    root, name = work / "data", "simds"
    for mode in ("img", "agn", "background"):
        for exp in ("20ks", "100ks"):
            for res in ("1x", "2x"):
                src = EXAMPLE / exp / mode / res
                if not src.exists():
                    continue
                dst = root / name / mode / exp / res
                dst.parent.mkdir(parents=True, exist_ok=True)
                dst.symlink_to(src)
    m1 = sorted((EXAMPLE / "detector_mask/1x").glob("*"))[0]
    m2 = sorted((EXAMPLE / "detector_mask/2x").glob("*"))[0]

    cfg = DatasetCfg(
        agn=1, batch_size=2, debug=True, comb_hr=False, crop_mode="center",
        directory=root, mode="img", name=name, scaling="sqrt", type="sim",
        lr=LrDatasetCfg(bkg=1, det_mask=m1, exps=[20],
                        clamp_max=0.0022336, res=416),
        hr=HrDatasetCfg(exp=100, det_mask=m2, clamp_max=0.0005584, res=832),
    )
    dm = XmmDataModule(cfg, splits_root=work / "splits", seed=0)
    mc = ModelCfg(
        name="esr_gen", memory_efficient=True, batch_size=2, s2d_train=True,
        model=RrdbCfg(base_model="esr_gen", filters=FILTERS,
                      residual_blocks=BLOCKS),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    tc = TrainerCfg(epochs=EPOCHS, checkpoint_root=work / "ckpt",
                    mesh=MeshCfg(data=1))
    loss = create_loss(None, LossCfg(psnr=0.5, ssim=0.5))
    trainer = Trainer(mc, tc, dm, loss, metric_names=["psnr", "ssim"])

    t0 = time.perf_counter()
    result = trainer.fit(seed=0)
    dt = time.perf_counter() - t0
    print(f"fit: {EPOCHS} epochs in {dt:.1f}s "
          f"({dt / max(len(result.history), 1):.1f} s/epoch)", flush=True)
    for h in result.history:
        print({k: round(float(v), 5) for k, v in h.items()
               if k in ("epoch", "train/loss", "val/loss")}, flush=True)
    print("best val/loss:", round(result.best_val_loss, 5),
          "at epoch", result.best_step, flush=True)


if __name__ == "__main__":
    main()
