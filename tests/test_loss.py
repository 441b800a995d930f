"""Composite loss builder vs reference semantics (loss_functions.py:11-47)."""

import tomllib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.config import LossCfg
from xmm_superres_denoise_tpu.metrics.functional import ms_ssim, psnr
from xmm_superres_denoise_tpu.train.loss import create_loss, load_scaling_tables

LOSS_TOML = Path(__file__).resolve().parents[1] / "res/configs/loss_functions.toml"


def _pair(shape=(1, 256, 256, 1), seed=0):  # >= 208 px for 5-scale MS-SSIM
    g = np.random.default_rng(seed)
    p = g.uniform(0, 1, shape).astype(np.float32)
    t = np.clip(p + g.normal(0, 0.05, shape), 0, 1).astype(np.float32)
    return jnp.asarray(p), jnp.asarray(t)


def test_paper_loss_psnr_msssim():
    with open(LOSS_TOML, "rb") as f:
        toml = tomllib.load(f)
    sc, cfg = load_scaling_tables(toml, "sqrt")
    loss = create_loss(sc, cfg)
    p, t = _pair()
    val = float(loss(p, t))
    expected = (
        0.5 * sc["psnr"]["scaling"] * float(psnr(p, t))
        + 0.5 * sc["ms_ssim"]["scaling"] * float(ms_ssim(p, t))
    )
    corr = sc["psnr"]["correction"] + sc["ms_ssim"]["correction"]
    if corr > 0:
        expected += corr
    np.testing.assert_allclose(val, expected, rtol=1e-5)
    # sanity: better prediction -> lower loss
    assert float(loss(t, t)) < val


def test_loss_without_scaling():
    cfg = LossCfg(l1=0.5, poisson=0.5)
    loss = create_loss(None, cfg)
    p, t = _pair(seed=1)
    v = float(loss(p, t))
    assert np.isfinite(v)
    assert len(loss.terms) == 2


def test_loss_is_differentiable():
    with open(LOSS_TOML, "rb") as f:
        toml = tomllib.load(f)
    sc, cfg = load_scaling_tables(toml, "sqrt")
    loss = create_loss(sc, cfg)
    p, t = _pair(seed=2)
    g = jax.grad(lambda x: loss(x, t))(p)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_loss_cfg_sum_validation():
    with pytest.raises(Exception):
        LossCfg(l1=0.0)  # sum == 0 -> invalid
    with pytest.raises(Exception):
        LossCfg(l1=0.9, psnr=0.9)  # sum > 1 -> invalid
