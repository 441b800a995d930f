"""CLI end-to-end smoke: config assembly + tiny boring-dataset fit/test."""

import json
from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.cli import load_run_config

ROOT = Path(__file__).resolve().parents[1]


def _write_run_config(tmp_path, epochs=1):
    cfg = f"""
[trainer]
accelerator = "auto"
strategy = "auto"
checkpoint_path = ""
checkpoint_root = "{tmp_path / 'ckpts'}"
devices = "auto"
epochs = {epochs}
log_images_every_n_epochs = 1
seed = 0

[trainer.mesh]
data = "auto"
fsdp = 1

[dataset]
agn = 0
batch_size = 8
check_files = false
crop_mode = "center"
debug = true
comb_hr = false
directory = "{tmp_path}"
mode = "img"
name = "boring_cli"
scaling = "sqrt"
type = "boring"

[dataset.lr]
bkg = 0
det_mask = ""
exps = [20]
clamp_max = 0.0022336
res = 32

[dataset.hr]
agn = true
exp = 100
det_mask = ""
clamp_max = 0.0005584
res = 64

[model]
name = "esr_gen"
memory_efficient = false
"""
    p = tmp_path / "run.toml"
    p.write_text(cfg)
    return p


def test_load_run_config(tmp_path):
    p = _write_run_config(tmp_path)
    ds, m, t, sc, loss = load_run_config(p, res_dir=ROOT / "res")
    assert ds.type.value == "boring"
    assert m.name.value == "esr_gen"
    assert m.model.filters == 32  # from the registry
    assert m.optimizer.learning_rate == 1e-4
    assert t.epochs == 1
    # sqrt scaling tables selected
    assert sc is not None and "psnr" in sc
    assert loss.psnr == 0.5 and loss.ms_ssim == 0.5


def test_cli_fit_smoke(tmp_path, monkeypatch):
    """Tiny full fit through the real Trainer (small model override)."""
    from xmm_superres_denoise_tpu.config import (
        LossCfg,
        MeshCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
        TrainerCfg,
    )
    from xmm_superres_denoise_tpu.data import XmmDataModule
    from xmm_superres_denoise_tpu.train import Trainer, create_loss

    run = _write_run_config(tmp_path)
    ds_cfg, _, t_cfg, _, _ = load_run_config(run, res_dir=ROOT / "res")
    dm = XmmDataModule(ds_cfg, splits_root=tmp_path / "splits", boring_size=24)
    mc = ModelCfg(
        name="esr_gen",
        memory_efficient=False,
        batch_size=8,
        model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    trainer = Trainer(
        mc, t_cfg, dm, create_loss(None, LossCfg(l1=1.0)),
        metric_names=["psnr", "l1"],
    )
    result = trainer.fit()
    assert len(result.history) == 1
    # image logger produced a panel (log_images_every_n_epochs = 1)
    panels = list((Path(t_cfg.checkpoint_root) / "esr_gen" / "images").rglob("*.png"))
    assert panels, "expected display panels from the image logger"
