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


def test_normalize_denormalize_fuzz():
    """Property sweep: 300 seeded cases across every stretch mode, max_val
    spanning 1e-8..1e6, and adversarial value distributions (log-spread tiny
    values, above-max clamping, sparse spikes, constant-at-max).

    Properties checked per case:
      * normalize output lies in [0, 1]
      * denormalize(normalize(x)) == clip(x, 0, max_val) within f32 tolerance
      * normalize is monotone (order-preserving) on sorted inputs

    The log stretch is special at both ends, inherent to the reference
    formula (normalize.py:23-32), not implementation error:
      * at saturation, stretch(1) = log(1001)/log(1000) > 1 is clipped to 1,
        so the round-trip returns destretch(1) = (1 - 1/1000) * max_val —
        a systematic 1e-3 relative loss on clamped pixels;
      * near zero, 1000**y - 1 cancellation gives an f32 absolute floor of
        ~1e-6 * max_val.
    Hence the log tolerance rtol=1.1e-3; all other modes round-trip ~5e-7.
    """
    rng = np.random.default_rng(0)
    for case in range(300):
        mode = MODES[case % 4]
        max_val = float(10.0 ** rng.uniform(-8, 6))
        shape = tuple(rng.integers(1, 50, size=2))
        kind = case % 5
        if kind == 0:
            x = rng.uniform(0, max_val, size=shape).astype(np.float32)
        elif kind == 1:  # log-spread: values down to 1e-10 * max_val
            x = (max_val * 10.0 ** rng.uniform(-10, 0, size=shape)).astype(
                np.float32
            )
        elif kind == 2:  # above-max values must clamp, not explode
            x = rng.uniform(0, 3 * max_val, size=shape).astype(np.float32)
        elif kind == 3:  # sparse spikes on a zero background
            x = np.zeros(shape, np.float32)
            x.flat[::3] = max_val
        else:  # saturated constant
            x = np.full(shape, max_val, np.float32)

        y = normalize(jnp.asarray(x), max_val, mode)
        yn = np.asarray(y)
        assert yn.min() >= 0.0 and yn.max() <= 1.0, (case, mode, max_val)

        back = np.asarray(denormalize(y, max_val, mode))
        tgt = np.clip(x, 0, max_val)
        rtol = 1.1e-3 if mode == "log" else 1e-4
        np.testing.assert_allclose(
            back, tgt, rtol=rtol, atol=5e-6 * max_val, err_msg=f"{case=} {mode=} {max_val=}"
        )

        sorted_in = np.sort(x.ravel())
        ys = np.asarray(normalize(jnp.asarray(sorted_in), max_val, mode))
        assert np.all(np.diff(ys) >= -1e-7), (case, mode, "monotonicity")


def test_stretch_destretch_fuzz():
    """Property sweep: stretch/destretch are exact inverses on [0, 1] for
    every mode, 100 seeded cases, to f32 round-off (calibrated <=8e-7 abs)."""
    rng = np.random.default_rng(1)
    for case in range(100):
        mode = MODES[case % 4]
        u = rng.uniform(0, 1, size=tuple(rng.integers(1, 64, size=2))).astype(
            np.float32
        )
        rt = np.asarray(destretch(stretch(jnp.asarray(u), mode), mode))
        np.testing.assert_allclose(rt, u, atol=2e-6, rtol=0, err_msg=f"{case=} {mode=}")


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
