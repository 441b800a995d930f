"""Metric functionals vs independent torch implementations + properties."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from xmm_superres_denoise_tpu.metrics.collection import (
    MetricBank,
    XMMMetricCollection,
)
from xmm_superres_denoise_tpu.metrics.functional import (
    l1,
    l2,
    ms_ssim,
    poisson_nll,
    psnr,
    ssim,
)
from xmm_superres_denoise_tpu.ops.ssim import (
    gaussian_kernel_1d,
    ms_ssim_per_image,
    ssim_per_image,
)
from xmm_superres_denoise_tpu.ops.stretch import Normalizer


def _torch_ssim(p, t, kernel_size=13, sigma=2.5, k1=0.01, k2=0.05, data_range=1.0):
    """Independent torch statement of the torchmetrics SSIM algorithm (NCHW)."""
    taps = torch.from_numpy(gaussian_kernel_1d(kernel_size, sigma)).double()
    kern = (taps[:, None] @ taps[None, :]).reshape(1, 1, kernel_size, kernel_size)
    pad = kernel_size // 2
    p = F.pad(p.double(), (pad, pad, pad, pad), mode="reflect")
    t = F.pad(t.double(), (pad, pad, pad, pad), mode="reflect")
    mu_p = F.conv2d(p, kern)
    mu_t = F.conv2d(t, kern)
    mu_pp = F.conv2d(p * p, kern)
    mu_tt = F.conv2d(t * t, kern)
    mu_pt = F.conv2d(p * t, kern)
    s_p = mu_pp - mu_p**2
    s_t = mu_tt - mu_t**2
    s_pt = mu_pt - mu_p * mu_t
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    upper = 2 * s_pt + c2
    lower = s_p + s_t + c2
    m = ((2 * mu_p * mu_t + c1) * upper) / ((mu_p**2 + mu_t**2 + c1) * lower)
    m = m[..., pad:-pad, pad:-pad]
    cs = (upper / lower)[..., pad:-pad, pad:-pad]
    return m.reshape(m.shape[0], -1).mean(-1), cs.reshape(cs.shape[0], -1).mean(-1)


def _pair(shape=(2, 64, 64, 1), seed=0):
    g = np.random.default_rng(seed)
    p = g.uniform(0, 1, shape).astype(np.float32)
    t = np.clip(p + g.normal(0, 0.05, shape), 0, 1).astype(np.float32)
    return p, t


def test_ssim_matches_torch_reference():
    p, t = _pair()
    ours = np.asarray(ssim_per_image(jnp.asarray(p), jnp.asarray(t)))
    ref, _ = _torch_ssim(
        torch.from_numpy(p.transpose(0, 3, 1, 2)),
        torch.from_numpy(t.transpose(0, 3, 1, 2)),
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_ssim_identity_is_one():
    p, _ = _pair(seed=1)
    val = np.asarray(ssim_per_image(jnp.asarray(p), jnp.asarray(p)))
    np.testing.assert_allclose(val, 1.0, atol=1e-5)


def test_ms_ssim_matches_torch_reference():
    p, t = _pair(shape=(1, 256, 256, 1), seed=2)
    ours = np.asarray(ms_ssim_per_image(jnp.asarray(p), jnp.asarray(t)))

    betas = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    tp = torch.from_numpy(p.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(t.transpose(0, 3, 1, 2))
    mcs = []
    sim = None
    for i in range(5):
        sim, cs = _torch_ssim(tp, tt)
        mcs.append(cs)
        if i < 4:
            tp = F.avg_pool2d(tp, 2)
            tt = F.avg_pool2d(tt, 2)
    mcs[-1] = sim
    stack = torch.relu(torch.stack(mcs))
    ref = torch.prod(stack ** torch.tensor(betas).view(-1, 1), dim=0)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_poisson_nll_matches_torch():
    p, t = _pair(seed=3)
    ours = float(poisson_nll(jnp.asarray(p), jnp.asarray(t)))
    ref = F.poisson_nll_loss(
        torch.from_numpy(p), torch.from_numpy(t), log_input=False, reduction="mean"
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_psnr_l1_l2():
    p, t = _pair(seed=4)
    mse = np.mean((p - t) ** 2)
    np.testing.assert_allclose(
        float(psnr(jnp.asarray(p), jnp.asarray(t))), 10 * np.log10(1.0 / mse), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(l1(jnp.asarray(p), jnp.asarray(t))), np.mean(np.abs(p - t)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(l2(jnp.asarray(p), jnp.asarray(t))), mse, rtol=1e-5
    )


def test_metric_bank_accumulation():
    bank = MetricBank(["psnr", "l1", "ssim"])
    state = bank.init()
    p1, t1 = _pair(seed=5)
    p2, t2 = _pair(seed=6)
    state = bank.update(state, jnp.asarray(p1), jnp.asarray(t1))
    state = bank.update(state, jnp.asarray(p2), jnp.asarray(t2))
    out = bank.compute(state)
    # l1 equals the element-weighted mean over both batches
    both = np.mean(np.abs(np.concatenate([p1 - t1, p2 - t2], axis=0)))
    np.testing.assert_allclose(float(out["l1"]), both, rtol=1e-5)
    # psnr computed from aggregated sse
    sse = ((p1 - t1) ** 2).sum() + ((p2 - t2) ** 2).sum()
    n = p1.size + p2.size
    np.testing.assert_allclose(
        float(out["psnr"]), 10 * np.log10(1.0 / (sse / n)), rtol=1e-5
    )


def test_xmm_collection_stretch_sweep():
    nz = Normalizer(0.0022336, 0.0005584, "sqrt")
    coll = XMMMetricCollection(
        nz, [Normalizer(0.0022336, 0.0005584, "linear")], prefix="val",
        metric_names=["psnr", "l1"],
    )
    state = coll.init()
    p, t = _pair(seed=7)
    state = coll.update(state, jnp.asarray(p), jnp.asarray(t))
    out = coll.compute(state)
    assert set(out) == {"val/linear/psnr", "val/linear/l1"}
    # destretch(sqrt) then stretch(linear) == square
    ref_l1 = np.mean(np.abs(p**2 - t**2))
    np.testing.assert_allclose(float(out["val/linear/l1"]), ref_l1, rtol=1e-5)


def test_xmm_collection_multi_stretch_sweep():
    """Per-stretch metric sweep over several scaling normalizers at once
    (the reference's stretch-sweep architecture, SURVEY.md §5.5)."""
    nz_ds = Normalizer(0.0022336, 0.0005584, "sqrt")
    sweeps = [
        Normalizer(0.0022336, 0.0005584, m) for m in ("linear", "sqrt", "asinh")
    ]
    coll = XMMMetricCollection(nz_ds, sweeps, prefix="test",
                               metric_names=["psnr", "l1"])
    state = coll.init()
    p, t = _pair(seed=11)
    state = coll.update(state, p, t)
    out = coll.compute(state)
    assert set(out) == {
        "test/linear/psnr", "test/linear/l1",
        "test/sqrt/psnr", "test/sqrt/l1",
        "test/asinh/psnr", "test/asinh/l1",
    }
    # sqrt sweep = identity re-stretch of the dataset normalization
    ref_l1 = float(np.mean(np.abs(np.asarray(p) - np.asarray(t))))
    np.testing.assert_allclose(float(out["test/sqrt/l1"]), ref_l1, rtol=1e-5)
    assert all(np.isfinite(v) for v in out.values())
