"""Aux subsystems: image logger, display module, profiling (SURVEY §5.1/5.5).

Direct coverage for the modules previously exercised only through the CLI
smoke: panel/FITS outputs of the ImageLogger rebuild, the pinned display
batch, StepTimers, and the XLA-cost-analysis FLOPs estimator."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.ops.stretch import Normalizer
from xmm_superres_denoise_tpu.utils.imagelogger import ImageLogger
from xmm_superres_denoise_tpu.utils.profiling import (
    StepTimers,
    annotate,
    flops_estimate,
)


def _logger(tmp_path, every=2):
    nz = Normalizer(lr_max=0.0022336, hr_max=0.0005584, mode="sqrt")
    return ImageLogger(tmp_path, nz, log_every_n_epochs=every,
                       lr_exp_ks=20.0, hr_exp_ks=100.0)


def test_imagelogger_panels_and_fits(tmp_path):
    g = np.random.default_rng(0)
    lr = g.uniform(0, 1, (3, 16, 16, 1)).astype(np.float32)
    preds = g.uniform(0, 1, (3, 32, 32, 1)).astype(np.float32)
    hr = g.uniform(0, 1, (3, 32, 32, 1)).astype(np.float32)

    lg = _logger(tmp_path, every=2)
    out = lg.log_batch(0, lr, preds, hr, tag="val", max_images=2)
    assert out is not None and out.exists()  # returns the panel PNG path
    epoch_dir = tmp_path / "epoch_00000"
    # panel + exposure-multiplied FITS per sample (reference
    # imagelogger.py:204-309 semantics)
    assert (epoch_dir / "val.png").exists()
    fits = sorted(epoch_dir.glob("*.fits*"))
    assert len(fits) == 4  # 2 samples x (input, generated)

    from xmm_superres_denoise_tpu.io.fits import read_image

    img, hdr = read_image(fits[0])
    assert np.isfinite(img).all()


def test_imagelogger_epoch_gating(tmp_path):
    lg = _logger(tmp_path, every=3)
    assert lg.should_log(0) and lg.should_log(3)
    assert not lg.should_log(1) and not lg.should_log(2)
    lr = np.zeros((1, 8, 8, 1), np.float32)
    preds = np.zeros((1, 8, 8, 1), np.float32)
    assert lg.log_batch(1, lr, preds) is None  # gated epochs write nothing
    assert not any(tmp_path.iterdir())


def test_imagelogger_no_label_columns(tmp_path):
    """Without HR labels only input/generated render (no ssim/diff)."""
    lg = _logger(tmp_path, every=1)
    lr = np.random.default_rng(1).uniform(0, 1, (1, 8, 8, 1)).astype(np.float32)
    preds = np.random.default_rng(2).uniform(0, 1, (1, 8, 8, 1)).astype(np.float32)
    out = lg.log_batch(0, lr, preds, hr=None, tag="nolabel")
    assert out is not None and out.name == "nolabel.png" and out.exists()


def test_display_module_pins_batch(tmp_path):
    from xmm_superres_denoise_tpu.config.schema import (
        DatasetCfg,
        HrDatasetCfg,
        LrDatasetCfg,
    )
    from xmm_superres_denoise_tpu.data.datamodule import XmmDataModule
    from xmm_superres_denoise_tpu.data.display import XmmDisplayDataModule

    ds = DatasetCfg(
        directory=tmp_path, scaling="sqrt", type="boring", batch_size=4,
        debug=True, name="boring_disp",
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=32),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=32),
    )
    dm = XmmDataModule(ds, splits_root=tmp_path / "splits", boring_size=16)
    disp = XmmDisplayDataModule(dm, split="val", num_images=2)
    assert len(disp.indices) == 2
    b1 = disp.display_batch()
    b2 = disp.display_batch()
    # pinned selection: identical every call (comparable across epochs)
    np.testing.assert_array_equal(b1["lr"], b2["lr"])
    assert b1["lr"].shape[0] == 2
    prep = disp.prepared_batch()
    assert prep["lr"].shape[0] == 2
    # boring pairs bypass normalization (datamodule.py: already pseudo-
    # normalized randn), so only finiteness is guaranteed here
    assert np.isfinite(prep["lr"]).all()


def test_step_timers_accumulate():
    import time

    t = StepTimers()
    with t.time("stage_a"):
        time.sleep(0.01)
    with t.time("stage_a"):
        time.sleep(0.01)
    with t.time("stage_b"):
        pass
    s = t.summary()
    assert s["stage_a"]["count"] == 2
    assert s["stage_a"]["total_s"] >= 0.02
    assert "stage_a" in t.report() and "stage_b" in t.report()


def test_flops_estimate_matmul():
    a = jnp.ones((64, 64), jnp.float32)
    fl = flops_estimate(lambda x: x @ x, a)
    if fl is None:
        pytest.skip("cost analysis unavailable on this backend")
    # 2*64^3 = 524288 (allow backend-dependent accounting slack)
    assert fl > 64**3


def test_annotate_contextmanager():
    with annotate("unit-test-region"):
        x = jnp.ones((4,)) + 1
    assert float(x.sum()) == 8.0


def test_write_xmm_product_sim_centered_wcs(tmp_path):
    """Sim-centered product WCS: boresight CRPIX and 4\"/res_mult CDELT
    (reference filehandling.py:84-104 constants)."""
    from xmm_superres_denoise_tpu.io.fits import read_image
    from xmm_superres_denoise_tpu.io.wcs import write_xmm_product

    img1 = np.random.default_rng(0).uniform(0, 1, (416, 416)).astype(np.float32)
    p1 = write_xmm_product(img1, tmp_path, "sim_1x", 1, 20_000.0)
    _, h1 = read_image(p1)
    assert h1["CRPIX1"] == 244.0 and h1["CRPIX2"] == 224.0
    np.testing.assert_allclose(h1["CDELT1"], -0.00111111113801599, rtol=1e-12)
    assert h1["EXPOSURE"] == 20_000.0

    img2 = np.random.default_rng(1).uniform(0, 1, (832, 832)).astype(np.float32)
    p2 = write_xmm_product(img2, tmp_path, "sim_2x", 2, 100_000.0)
    _, h2 = read_image(p2)
    assert h2["CRPIX1"] == 487.5 and h2["CRPIX2"] == 447.5
    np.testing.assert_allclose(h2["CDELT2"], 0.00111111113801599 / 2, rtol=1e-12)


def test_display_batch_cached_and_rng_preserved(tmp_path):
    """The display batch is composed ONCE (panels comparable across epochs)
    and must not consume draws from the dataset's shared rng (regression:
    per-epoch re-sampling changed both the panels and the training sample
    sequence whenever image logging was enabled)."""
    import numpy as np

    from xmm_superres_denoise_tpu.data.display import XmmDisplayDataModule

    class _StochasticDataset:
        def __init__(self):
            self.rng = np.random.default_rng(7)
            self.calls = 0

        def __getitem__(self, i):
            self.calls += 1
            # consumes the shared rng like XmmDataset's AGN/bkg picks
            img = self.rng.uniform(0, 1, (1, 8, 8)).astype(np.float32)
            return img, img.copy()

    class _DM:
        dataset = _StochasticDataset()

    dm = _DM()
    disp = XmmDisplayDataModule.__new__(XmmDisplayDataModule)
    disp.dm = dm
    disp.indices = [0, 1]
    disp._cached = None

    state_before = dm.dataset.rng.bit_generator.state
    b1 = disp.display_batch()
    # shared rng untouched (display used a private one)
    assert dm.dataset.rng.bit_generator.state == state_before
    b2 = disp.display_batch()
    np.testing.assert_array_equal(b1["lr"], b2["lr"])
    assert dm.dataset.calls == 2, "second call must hit the cache"
