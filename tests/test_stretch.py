"""Stretch/normalize semantics vs the reference formulas (normalize.py:4-107)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from xmm_superres_denoise_tpu.ops import (
    Normalizer,
    denormalize,
    destretch,
    normalize,
    stretch,
)

MODES = ["linear", "sqrt", "log", "asinh"]


def _torch_stretch(x: torch.Tensor, mode: str) -> torch.Tensor:
    # Independent re-statement of the reference stretch formulas for cross-check.
    if mode == "linear":
        return x
    if mode == "sqrt":
        return torch.sqrt(x)
    if mode == "log":
        a = torch.tensor(1000.0)
        return torch.log(a * x + 1) / torch.log(a)
    if mode == "asinh":
        a = torch.tensor(0.02)
        return torch.asinh(x / a) / torch.asinh(1.0 / a)
    raise ValueError(mode)


@pytest.mark.parametrize("mode", MODES)
def test_stretch_matches_torch_reference(mode):
    x = np.random.default_rng(1).uniform(0, 1, size=(64, 64)).astype(np.float32)
    ours = np.asarray(stretch(jnp.asarray(x), mode))
    ref = _torch_stretch(torch.from_numpy(x), mode).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", MODES)
def test_stretch_roundtrip(mode):
    x = np.random.default_rng(2).uniform(0, 1, size=(32, 32)).astype(np.float32)
    back = np.asarray(destretch(stretch(jnp.asarray(x), mode), mode))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", MODES)
def test_normalize_denormalize_roundtrip(mode):
    max_val = 0.0022336  # production lr_max (baseline_config.toml:34)
    x = np.random.default_rng(3).uniform(0, max_val, size=(41, 43)).astype(np.float32)
    y = normalize(jnp.asarray(x), max_val, mode)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
    back = np.asarray(denormalize(y, max_val, mode))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-6)


def test_normalize_clamps_above_max():
    max_val = 0.5
    x = jnp.asarray([[0.4, 0.7, 2.0]])
    y = normalize(x, max_val, "linear")
    np.testing.assert_allclose(np.asarray(y), [[0.8, 1.0, 1.0]], rtol=1e-6)


def test_normalizer_lr_hr_paths():
    nz = Normalizer(lr_max=0.0022336, hr_max=0.0005584, mode="sqrt")
    x = jnp.full((8, 8), 0.0005584)
    lr = nz.normalize_lr(x)
    hr = nz.normalize_hr(x)
    # hr saturates at 1.0; lr is sqrt(hr_max/lr_max)
    np.testing.assert_allclose(np.asarray(hr), 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lr), np.sqrt(0.0005584 / 0.0022336), rtol=1e-5
    )
