"""Early stopping (trainer.early_stopping_patience/min_delta): Lightning's
EarlyStopping callback rebuilt as trainer knobs on the val/loss monitor.
"""

from pathlib import Path

import numpy as np

from xmm_superres_denoise_tpu.config import (
    LossCfg,
    ModelCfg,
    OptimizerCfg,
    RrdbCfg,
)
from xmm_superres_denoise_tpu.data.datamodule import XmmDataModule
from xmm_superres_denoise_tpu.train import Trainer, create_loss

from tests.test_cli import _write_run_config
from xmm_superres_denoise_tpu.cli import load_run_config

ROOT = Path(__file__).resolve().parents[1]


def _fit(tmp_path, epochs, patience, lr_rate, min_delta=0.0):
    run = _write_run_config(tmp_path, epochs=epochs)
    ds_cfg, _, t_cfg, _, _ = load_run_config(run, res_dir=ROOT / "res")
    t_cfg = t_cfg.model_copy(update={
        "early_stopping_patience": patience,
        "early_stopping_min_delta": min_delta,
        "log_images_every_n_epochs": 0,
        "checkpoint_root": tmp_path / f"ck_{patience}_{lr_rate}",
    })
    assert t_cfg.early_stopping_patience == patience
    dm = XmmDataModule(ds_cfg, splits_root=tmp_path / "splits",
                       boring_size=24)
    mc = ModelCfg(
        name="esr_gen", memory_efficient=False, batch_size=8,
        model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=lr_rate),
    )
    trainer = Trainer(mc, t_cfg, dm, create_loss(None, LossCfg(l1=1.0)),
                      metric_names=["psnr", "l1"])
    return trainer.fit(seed=0)


def test_early_stopping_halts_on_plateau(tmp_path):
    """learning_rate=0 -> val/loss is exactly constant -> epoch 0 sets the
    best, epochs 1..patience never improve -> fit stops at patience+1
    epochs instead of the configured maximum."""
    result = _fit(tmp_path, epochs=8, patience=2, lr_rate=0.0)
    assert len(result.history) == 3  # 1 best + 2 non-improving
    assert np.isfinite(result.best_val_loss)


def test_early_stopping_min_delta_counts_tiny_gains_as_plateau(tmp_path):
    """A huge min_delta makes real (small) improvements non-qualifying."""
    result = _fit(tmp_path, epochs=8, patience=1, lr_rate=1e-4,
                  min_delta=1e9)
    assert len(result.history) == 2  # first epoch + 1 'non-improving'


def test_early_stopping_disabled_runs_all_epochs(tmp_path):
    result = _fit(tmp_path, epochs=3, patience=0, lr_rate=0.0)
    assert len(result.history) == 3
