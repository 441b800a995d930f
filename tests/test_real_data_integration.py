"""Integration: the sim dataset pipeline over the reference's example FITS.

Builds the canonical `<dir>/<name>/<mode>/<exp>ks/<res>x/` layout via
symlinks to `/root/reference/data/example_data` (which nests `<exp>ks/<mode>`
the other way around) and runs catalog matching, compositing, splits, the
fused device preprocessing, and one DP train step on real data.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

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

EXAMPLE = Path("/root/reference/data/example_data/sim")
MASK_1X = EXAMPLE / "detector_mask/1x"
MASK_2X = EXAMPLE / "detector_mask/2x"

pytestmark = pytest.mark.skipif(
    not EXAMPLE.exists(), reason="reference example data unavailable"
)


@pytest.fixture
def sim_tree(tmp_path):
    """Symlink example data into the canonical catalog layout."""
    root = tmp_path / "data"
    name = "simds"
    for mode in ("img", "agn", "background"):
        for exp, res in (("20ks", "1x"), ("100ks", "2x")):
            src = EXAMPLE / exp / mode / res
            if not src.exists():
                continue
            dst = root / name / mode / exp / res
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.symlink_to(src)
    mask1 = sorted(MASK_1X.glob("*.ds")) + sorted(MASK_1X.glob("*.fits*"))
    mask2 = sorted(MASK_2X.glob("*.ds")) + sorted(MASK_2X.glob("*.fits*"))
    return root, name, (mask1[0] if mask1 else None), (mask2[0] if mask2 else None)


def _cfg(root, name, m1, m2, batch=2):
    return DatasetCfg(
        agn=1,
        batch_size=batch,
        check_files=True,  # exercises the integrity checker on real files
        debug=True,
        comb_hr=False,
        crop_mode="center",
        directory=root,
        mode="img",
        name=name,
        scaling="sqrt",
        type="sim",
        lr=LrDatasetCfg(
            bkg=1, det_mask=m1, exps=[20], clamp_max=0.0022336, res=416
        ),
        hr=HrDatasetCfg(exp=100, det_mask=m2, clamp_max=0.0005584, res=832),
    )


def test_sim_pipeline_end_to_end(sim_tree, tmp_path):
    root, name, m1, m2 = sim_tree
    cfg = _cfg(root, name, m1, m2)
    dm = XmmDataModule(cfg, splits_root=tmp_path / "splits", seed=0)

    assert dm.dataset.catalog.base_name_count >= 3
    assert len(dm.dataset) == dm.dataset.catalog.base_name_count

    # raw sample: native composite geometry
    lr_raw, hr_raw = dm.dataset[0]
    assert lr_raw.shape == (1, 411, 403)
    assert hr_raw.shape == (1, 822, 806)
    assert lr_raw.min() >= 0

    batch = next(iter(dm.loader("train", batch_size=2)))
    assert batch["lr"].shape == (2, 416, 416, 1)
    assert batch["hr"].shape == (2, 832, 832, 1)
    lr = np.asarray(batch["lr"])
    assert 0.0 <= lr.min() and lr.max() <= 1.0
    assert lr.max() > 0.05  # real counts present after normalization

    # detector mask zeros survive preprocessing (mask applied before pad)
    if m1 is not None:
        from xmm_superres_denoise_tpu.io import read_image

        mask, _ = read_image(m1)
        padded = np.zeros((416, 416), np.float32)
        padded[2:413, 6:409] = mask
        assert np.all(lr[0, padded == 0, 0] == 0.0)


def test_train_step_on_real_data(sim_tree, tmp_path):
    root, name, m1, m2 = sim_tree
    cfg = _cfg(root, name, m1, m2)
    dm = XmmDataModule(cfg, splits_root=tmp_path / "splits", seed=0)

    from xmm_superres_denoise_tpu.train import Trainer, create_loss

    mc = ModelCfg(
        name="esr_gen",
        memory_efficient=False,
        batch_size=2,
        model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    tc = TrainerCfg(epochs=1, checkpoint_root=tmp_path / "ck", mesh=MeshCfg(data=2))
    trainer = Trainer(
        mc, tc, dm, create_loss(None, LossCfg(l1=1.0)), metric_names=["l1"]
    )
    state = trainer.init_state()
    batch = next(iter(trainer.dm.loader("train", mesh=trainer.mesh)))
    state2, loss = trainer._train_step(state, batch)
    assert np.isfinite(float(loss))


REAL = Path("/root/reference/data/example_data/real")


@pytest.mark.skipif(not REAL.exists(), reason="reference example data unavailable")
def test_real_dataset_pipeline(tmp_path):
    """Real exposure-split dataset: catalog over obsid base names, no HR."""
    cfg = DatasetCfg(
        agn=0,
        batch_size=2,
        check_files=False,
        debug=True,
        comb_hr=False,
        crop_mode="center",
        directory=REAL.parent,
        mode="img",
        name="real",
        scaling="sqrt",
        type="real",
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=416),
        hr=None,
    )
    dm = XmmDataModule(cfg, splits_root=tmp_path / "splits", seed=0)
    assert dm.dataset.catalog.base_name_count >= 4
    lr_raw, hr_raw = dm.dataset[0]
    assert lr_raw.shape == (1, 411, 403)
    assert hr_raw is None

    batch = next(iter(dm.loader("train", batch_size=2)))
    assert batch["lr"].shape == (2, 416, 416, 1)
    # without HR the loader mirrors the input as the target
    assert batch["hr"].shape == (2, 416, 416, 1)
    # splits persisted with the reference's real layout ({exp}ks.p leaf)
    assert (tmp_path / "splits" / "real" / "train" / "20ks.p").exists()


@pytest.fixture
def sim_tree_two_exps(tmp_path):
    """Canonical layout with TWO LR exposures (20ks + 50ks)."""
    root = tmp_path / "data2"
    name = "simds2"
    for mode in ("img", "agn", "background"):
        for exp, res in (("20ks", "1x"), ("50ks", "1x"), ("100ks", "2x")):
            src = EXAMPLE / exp / mode / res
            if not src.exists():
                continue
            dst = root / name / mode / exp / res
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.symlink_to(src)
    return root, name


def test_multi_exposure_index_expansion(sim_tree_two_exps, tmp_path):
    """Mixed-radix (base, exposure) decomposition over two real exposure sets
    — the corrected semantics of the reference's aliased indexing
    (SURVEY.md §2.4, dataset.py:214-215)."""
    root, name = sim_tree_two_exps
    cfg = DatasetCfg(
        agn=0,
        batch_size=2,
        check_files=False,
        debug=True,
        comb_hr=False,
        crop_mode="center",
        directory=root,
        mode="img",
        name=name,
        scaling="sqrt",
        type="sim",
        lr=LrDatasetCfg(bkg=0, exps=[20, 50], clamp_max=0.0022336, res=416),
        hr=HrDatasetCfg(exp=100, clamp_max=0.0005584, res=832),
    )
    dm = XmmDataModule(cfg, splits_root=tmp_path / "splits2", seed=0)
    n_base = dm.dataset.catalog.base_name_count
    assert len(dm.dataset) == n_base * 2

    # index i and i + n_base must select the same base at different exposures
    b0, e0 = dm.dataset.decompose_index(0)
    b1, e1 = dm.dataset.decompose_index(n_base)
    assert b0 == b1 == 0 and e0 == 0 and e1 == 1

    # exhaustive uniformity: every (base, exposure) pair is indexed exactly
    # once over the full range — the anti-aliasing property the mixed-radix
    # decomposition exists for (reference defect at dataset.py:214-215)
    from collections import Counter

    pairs = Counter(
        dm.dataset.decompose_index(i) for i in range(len(dm.dataset))
    )
    assert len(pairs) == n_base * 2
    assert set(pairs.values()) == {1}

    # split expansion covers both exposure replicas
    tr = dm.split_indices("train")
    assert len(tr) == len(set(tr))
    assert any(i >= n_base for i in tr) and any(i < n_base for i in tr)

    # both exposures load fine
    lr0, _ = dm.dataset[0]
    lr1, _ = dm.dataset[n_base]
    assert lr0.shape == lr1.shape == (1, 411, 403)
