"""Extended metric suite: identity/ordering/range properties + torch GMSD check."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavyweight numerics; default path runs -m 'not slow'

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from xmm_superres_denoise_tpu.metrics.extended import (
    fsim_per_image,
    gmsd_per_image,
    haarpsi_per_image,
    mdsi_per_image,
    ms_gmsd_per_image,
    vif_p_per_image,
)


def _pair(shape=(2, 96, 96, 1), seed=0, noise=0.05):
    g = np.random.default_rng(seed)
    # structured image (gradients matter for these metrics)
    yy, xx = np.mgrid[0 : shape[1], 0 : shape[2]]
    base = 0.5 + 0.3 * np.sin(xx / 7.0) * np.cos(yy / 11.0)
    t = np.stack([base + 0.05 * g.random(shape[1:3]) for _ in range(shape[0])])
    t = np.clip(t, 0, 1).astype(np.float32)[..., None]
    p = np.clip(t + g.normal(0, noise, t.shape), 0, 1).astype(np.float32)
    return jnp.asarray(p), jnp.asarray(t)


def _torch_gmsd(p, t):
    """Independent torch statement of the piq GMSD algorithm (NCHW)."""
    def pool(z):
        pad = max(z.shape[-2] % 2, z.shape[-1] % 2)
        if pad:
            z = F.pad(z, (0, pad, 0, pad))
        return F.avg_pool2d(z, 2)

    p, t = pool(p), pool(t)
    k = torch.tensor([[-1.0, 0, 1], [-1, 0, 1], [-1, 0, 1]]) / 3.0
    ks = torch.stack([k, k.t()]).unsqueeze(1)
    gp = torch.sqrt((F.conv2d(p, ks, padding=1) ** 2).sum(1, keepdim=True) + 1e-12)
    gt = torch.sqrt((F.conv2d(t, ks, padding=1) ** 2).sum(1, keepdim=True) + 1e-12)
    c = 170.0 / (255.0**2)
    gms = (2 * gp * gt + c) / (gp**2 + gt**2 + c)
    mean = gms.mean(dim=[1, 2, 3], keepdim=True)
    return ((gms - mean) ** 2).mean(dim=[1, 2, 3]).sqrt()


def test_gmsd_matches_torch():
    p, t = _pair(seed=1)
    ours = np.asarray(gmsd_per_image(p, t))
    ref = _torch_gmsd(
        torch.from_numpy(np.asarray(p).transpose(0, 3, 1, 2)),
        torch.from_numpy(np.asarray(t).transpose(0, 3, 1, 2)),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize(
    "fn,identity",
    [
        (gmsd_per_image, 0.0),  # deviation metric: 0 at identity
        (ms_gmsd_per_image, 0.0),
        (haarpsi_per_image, 1.0),  # similarity: 1 at identity
        (fsim_per_image, 1.0),
        (vif_p_per_image, 1.0),
    ],
)
def test_identity_values(fn, identity):
    _, t = _pair(seed=2)
    val = np.asarray(fn(t, t))
    np.testing.assert_allclose(val, identity, atol=2e-3)


@pytest.mark.parametrize(
    "fn,higher_better",
    [
        (gmsd_per_image, False),
        (ms_gmsd_per_image, False),
        (haarpsi_per_image, True),
        (fsim_per_image, True),
        (vif_p_per_image, True),
        (mdsi_per_image, False),  # deviation-pooled: lower is better
    ],
)
def test_noise_ordering(fn, higher_better):
    p_small, t = _pair(seed=3, noise=0.02)
    p_big, _ = _pair(seed=3, noise=0.15)
    v_small = float(np.mean(np.asarray(fn(p_small, t))))
    v_big = float(np.mean(np.asarray(fn(p_big, t))))
    if higher_better:
        assert v_small > v_big
    else:
        assert v_small < v_big


def test_mdsi_identity_near_zero():
    _, t = _pair(seed=4)
    val = np.asarray(mdsi_per_image(t, t))
    assert np.all(val < 0.05)


def test_collection_with_extended_names():
    from xmm_superres_denoise_tpu.metrics import get_ext_metrics
    from xmm_superres_denoise_tpu.ops.stretch import Normalizer

    nz = Normalizer(1.0, 1.0, "linear")
    coll = get_ext_metrics(nz, [nz], prefix="test")
    state = coll.init()
    p, t = _pair(seed=5)
    state = coll.update(state, p, t)
    out = coll.compute(state)
    assert "test/linear/fsim" in out and "test/linear/vif_p" in out
    assert all(np.isfinite(v) for v in out.values())


def test_fsim_matches_numpy_oracle():
    """fsim_per_image vs the independent numpy PC2 oracle
    (metrics/fsim_oracle.py, piq algorithm with the phase-deviation term):
    agreement to <= 1e-5 on random tensors and a real example image."""
    from pathlib import Path

    from xmm_superres_denoise_tpu.metrics.extended import fsim_per_image
    from xmm_superres_denoise_tpu.metrics.fsim_oracle import fsim_oracle

    g = np.random.default_rng(0)
    a = g.uniform(0, 1, (2, 96, 96, 1)).astype(np.float32)
    b = np.clip(a + g.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    j = np.asarray(fsim_per_image(jnp.asarray(a), jnp.asarray(b)))
    o = fsim_oracle(a, b)
    np.testing.assert_allclose(j, o, atol=1e-5)

    real = sorted(
        Path("/root/reference/data/example_data/real/20ks").glob("*.fits")
    )
    if real:
        from xmm_superres_denoise_tpu.io.fits import read_image
        from xmm_superres_denoise_tpu.ops.preprocess import pad_to_res
        from xmm_superres_denoise_tpu.ops.stretch import Normalizer

        img, hdr = read_image(real[0])
        rate = np.asarray(img, np.float32) / max(
            float(hdr.get("EXPOSURE", 2e4)), 1.0
        )
        x = np.asarray(pad_to_res(jnp.asarray(rate[None]), 416))[..., None]
        nz = Normalizer(lr_max=0.0022336, hr_max=0.0022336, mode="sqrt")
        xn = np.asarray(nz.normalize_lr(jnp.asarray(x)))
        noisy = np.clip(xn + g.normal(0, 0.05, xn.shape), 0, 1).astype(
            np.float32
        )
        j = float(fsim_per_image(jnp.asarray(xn), jnp.asarray(noisy))[0])
        o = float(fsim_oracle(xn, noisy)[0])
        assert abs(j - o) <= 1e-5


def test_mixed_parity_dims_do_not_crash():
    """_avg_pool2 must pad H and W independently: a (5, 4) image (one odd,
    one even dim — e.g. any odd-height eval crop) crashed the reshape when
    both dims were padded by max(ph, pw)."""
    from xmm_superres_denoise_tpu.metrics.extended import (
        _avg_pool2,
        gmsd_per_image,
        haarpsi_per_image,
        ms_gmsd_per_image,
    )

    g = np.random.default_rng(0)
    p = jnp.asarray(g.uniform(0, 1, (2, 37, 44, 1)).astype(np.float32))
    t = jnp.asarray(g.uniform(0, 1, (2, 37, 44, 1)).astype(np.float32))
    pooled = _avg_pool2(jnp.asarray(g.uniform(0, 1, (1, 5, 4, 1))))
    assert pooled.shape == (1, 3, 2, 1)
    for fn in (gmsd_per_image, ms_gmsd_per_image, haarpsi_per_image):
        out = fn(p, t)
        assert out.shape == (2,) and bool(jnp.isfinite(out).all()), fn.__name__


def test_absolute_values_fixture():
    """Absolute-value regression anchors (VERDICT r3 #6): every extended
    metric must reproduce the committed fixture values on seeded synthetic
    AND real example-data pairs. The fixture doubles as the piq-parity
    vehicle: rerun scripts/make_extended_metric_fixture.py --piq wherever
    piq is installed and the recorded piq values are asserted here too
    (deltas per the fixture's methodology notes)."""
    import importlib.util
    import json
    from pathlib import Path

    fixture_path = Path(__file__).parent / "fixtures" / "extended_metrics_expected.json"
    fixture = json.loads(fixture_path.read_text())

    spec = importlib.util.spec_from_file_location(
        "_ext_fixture_gen",
        Path(__file__).resolve().parents[1]
        / "scripts"
        / "make_extended_metric_fixture.py",
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    cases = {n: (p, t) for n, p, t in gen.synthetic_cases()}
    cases.update({n: (p, t) for n, p, t in gen.example_data_cases()})

    checked = 0
    for name, entry in fixture["cases"].items():
        if name not in cases:  # example data absent on this machine
            continue
        p, t = cases[name]
        got = gen.intree_values(p, t)
        for metric, expected in entry["intree"].items():
            np.testing.assert_allclose(
                got[metric], expected, rtol=1e-3, atol=1e-5,
                err_msg=f"{name}/{metric} drifted from the committed anchor",
            )
            checked += 1
        if "piq" in entry:
            for metric, piq_vals in entry["piq"].items():
                tol = 5e-3 if metric == "fsim" else 1e-3
                np.testing.assert_allclose(
                    got[metric], piq_vals, atol=tol,
                    err_msg=f"{name}/{metric} disagrees with recorded piq",
                )
    assert checked >= 18  # 6 metrics x >=3 synthetic cases always present
