"""Geometry ops vs reference semantics (tools.py:103-126, imageupsample.py, crop.py)."""

import jax.numpy as jnp
import numpy as np
import torch

from xmm_superres_denoise_tpu.ops import (
    crop,
    crop_fractions,
    pad_to_res,
    preprocess,
    unpad_from_res,
    upsample_nearest,
)


def _torch_reshape_img_to_res(res, img):
    # Reference pad arithmetic (data/tools.py:103-126), re-stated for cross-check.
    y_diff = res - img.shape[1]
    y_top = int(np.floor(y_diff / 2.0))
    x_diff = res - img.shape[2]
    x_left = int(np.floor(x_diff / 2.0))
    return torch.nn.functional.pad(
        img, (x_left, x_diff - x_left, y_top, y_diff - y_top, 0, 0)
    )


def test_pad_to_res_matches_reference():
    img = np.random.default_rng(0).random((1, 411, 403)).astype(np.float32)
    ours = np.asarray(pad_to_res(jnp.asarray(img), 416))
    ref = _torch_reshape_img_to_res(416, torch.from_numpy(img)).numpy()
    assert ours.shape == (1, 416, 416)
    np.testing.assert_array_equal(ours, ref)


def test_pad_unpad_roundtrip():
    img = np.random.default_rng(1).random((2, 411, 403)).astype(np.float32)
    padded = pad_to_res(jnp.asarray(img), 416)
    back = np.asarray(unpad_from_res(padded, (411, 403)))
    np.testing.assert_array_equal(back, img)


def test_pad_2x_geometry():
    img = jnp.zeros((1, 822, 806))
    assert pad_to_res(img, 832).shape == (1, 832, 832)


def test_upsample_conserves_flux():
    img = np.random.default_rng(2).random((1, 10, 12)).astype(np.float32)
    up = np.asarray(upsample_nearest(jnp.asarray(img), 2))
    assert up.shape == (1, 20, 24)
    np.testing.assert_allclose(up.sum(), img.sum(), rtol=1e-5)
    # matches torch nn.Upsample(nearest)/4
    ref = (
        torch.nn.Upsample(scale_factor=2, mode="nearest")(
            torch.from_numpy(img)[None]
        ).numpy()[0]
        / 4.0
    )
    np.testing.assert_allclose(up, ref, rtol=1e-6)


def test_crop_center_and_boresight():
    img = jnp.asarray(np.arange(411 * 403, dtype=np.float32).reshape(411, 403))
    top_p, left_p = crop_fractions("center", 0.5)
    out = crop(img, 0.5, top_p, left_p)
    assert out.shape == (205, 201)
    top_p, left_p = crop_fractions("boresight", 0.25)
    out = crop(img, 0.25, top_p, left_p)
    assert out.shape == (102, 100)
    # boresight crop is centred on (y=224, x=244): compare the CONTENT
    # against the expected slice (the old assertion was a constant
    # arithmetic identity that never inspected `out`)
    y0 = int((224 / 411 - 0.125) * 411)
    x0 = int((244 / 403 - 0.125) * 403)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(img)[y0 : y0 + 102, x0 : x0 + 100]
    )
    cy, cx = y0 + 102 // 2, x0 + 100 // 2
    assert abs(cy - 224) <= 1 and abs(cx - 244) <= 1


def test_fused_preprocess():
    img = np.random.default_rng(3).uniform(0, 0.005, (411, 403)).astype(np.float32)
    mask = (np.random.default_rng(4).random((411, 403)) > 0.1).astype(np.float32)
    out = preprocess(
        jnp.asarray(img), jnp.asarray(mask), res=416, max_val=0.0022336, mode="sqrt"
    )
    assert out.shape == (416, 416)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # manual chain
    manual = np.clip(img * mask, 0, 0.0022336) / 0.0022336
    manual = np.sqrt(manual)
    manual_p = np.zeros((416, 416), np.float32)
    manual_p[2:413, 6:409] = manual
    np.testing.assert_allclose(np.asarray(out), manual_p, rtol=1e-5, atol=1e-6)


def test_geometry_property_fuzz():
    """Property sweep: 150 seeded cases over random shapes/scales/crops.

    Properties (each mirrors a reference-semantics invariant):
      * pad_to_res is count-preserving (zero pad adds no flux) and
        unpad_from_res inverts it exactly for any native shape <= res;
      * the padded border is exactly zero;
      * upsample_nearest with conserve_flux preserves total counts for any
        scale (imageupsample.py:17-20), and without it multiplies flux by
        scale**2;
      * crop output shape is exactly int(h*crop_p) x int(w*crop_p), stays
        in bounds for any (top_p, left_p) in [0, 1] (edge clamp,
        crop.py:17-33), and is a verbatim subarray of the input;
      * crop_fractions origins keep the crop window inside the image for
        all three modes.
    """
    rng = np.random.default_rng(7)
    for case in range(150):
        h = int(rng.integers(1, 120))
        w = int(rng.integers(1, 120))
        res = int(max(h, w) + rng.integers(0, 40))
        img = rng.uniform(0, 100, size=(h, w)).astype(np.float32)

        padded = np.asarray(pad_to_res(jnp.asarray(img), res))
        assert padded.shape == (res, res)
        np.testing.assert_allclose(padded.sum(), img.sum(), rtol=1e-5)
        back = np.asarray(unpad_from_res(jnp.asarray(padded), (h, w)))
        np.testing.assert_array_equal(back, img)
        total_nonzero = np.count_nonzero(padded)
        assert total_nonzero <= img.size  # border contributed nothing

        scale = int(rng.integers(1, 5))
        up = np.asarray(upsample_nearest(jnp.asarray(img), scale))
        assert up.shape == (h * scale, w * scale)
        np.testing.assert_allclose(up.sum(), img.sum(), rtol=1e-4)
        up_raw = np.asarray(
            upsample_nearest(jnp.asarray(img), scale, conserve_flux=False)
        )
        np.testing.assert_allclose(
            up_raw.sum(), img.sum() * scale * scale, rtol=1e-4
        )

        crop_p = float(rng.uniform(0.1, 1.0))
        top_p = float(rng.uniform(0.0, 1.0))
        left_p = float(rng.uniform(0.0, 1.0))
        out = np.asarray(crop(jnp.asarray(img), crop_p, top_p, left_p))
        if crop_p == 1.0:
            np.testing.assert_array_equal(out, img)
        else:
            eh, ew = int(h * crop_p), int(w * crop_p)
            assert out.shape == (eh, ew)
            top = min(int(top_p * h), h - eh)
            left = min(int(left_p * w), w - ew)
            np.testing.assert_array_equal(
                out, img[top : top + eh, left : left + ew]
            )

        for mode in ("random", "center", "boresight"):
            tp, lp = crop_fractions(mode, crop_p, native_hw=(h, w), rng=rng)
            # the binding invariant: crop() with these fractions stays in
            # bounds and yields the full requested window (boresight origins
            # can go slightly negative on tiny images; crop clamps)
            cropped = np.asarray(
                crop(jnp.asarray(img), crop_p, max(tp, 0.0), max(lp, 0.0))
            )
            assert cropped.shape == (int(h * crop_p), int(w * crop_p))
