"""Image-geometry ops and the fused preprocessing pipeline.

TPU-native replacements for the reference's host-side torch transforms:

* pad-to-res      <- `reshape_img_to_res` (`data/tools.py:103-126`)
* nearest-upsample with flux conservation <- `ImageUpsample`
                     (`transforms/imageupsample.py:5-26`)
* crop            <- `Crop` (`transforms/crop.py:4-62`)
* fused mask*pad*normalize preprocessing <- the per-sample chain in
  `dataset.py:213-270` + `run_inference_on_file.py:137-152`, expressed as one
  jitted function so XLA fuses it into a single elementwise pass over HBM.

Layout convention: the framework is NHWC throughout (TPU/XLA's preferred conv
layout); single-channel X-ray images are (..., H, W, 1). Helpers here accept
(..., H, W) and treat trailing dims (H, W) uniformly under vmap/batching.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stretch import normalize

Array = jnp.ndarray

# Native XMM EPIC-pn detector-coordinate image geometry at bin 80 (4"/px):
# NAXIS1=403 (x), NAXIS2=411 (y) -> numpy shape (411, 403). See BASELINE.md
# "Input image spec" and the detector-mask headers.
NATIVE_HW: Tuple[int, int] = (411, 403)
MODEL_RES = 416


def pad_to_res(img: Array, res: int) -> Array:
    """Center zero-pad (crop if larger) the trailing (H, W) dims to (res, res).

    Equivalent to `reshape_img_to_res` (`data/tools.py:103-126`): the top/left
    pad gets floor(diff/2). Static shapes only — sizes must be known at trace
    time (they always are: 411x403 -> 416, or 822x806 -> 832).
    """
    h, w = img.shape[-2], img.shape[-1]
    y_diff = res - h
    x_diff = res - w
    if y_diff < 0 or x_diff < 0:
        raise ValueError(f"pad_to_res only pads; got {h}x{w} -> {res}")
    y_top = y_diff // 2
    x_left = x_diff // 2
    pad = [(0, 0)] * (img.ndim - 2) + [
        (y_top, y_diff - y_top),
        (x_left, x_diff - x_left),
    ]
    return jnp.pad(img, pad)


def unpad_from_res(img: Array, native_hw: Tuple[int, int]) -> Array:
    """Inverse of :func:`pad_to_res`: slice the native (H, W) region back out."""
    h, w = native_hw
    res_h, res_w = img.shape[-2], img.shape[-1]
    y_top = (res_h - h) // 2
    x_left = (res_w - w) // 2
    return img[..., y_top : y_top + h, x_left : x_left + w]


def upsample_nearest(img: Array, scale: int, conserve_flux: bool = True) -> Array:
    """Nearest-neighbour x`scale` upsample of trailing (H, W) dims.

    With ``conserve_flux`` the result is divided by scale**2 so total counts
    are preserved, matching `ImageUpsample` (`transforms/imageupsample.py:17-20`).
    """
    img = jnp.repeat(jnp.repeat(img, scale, axis=-2), scale, axis=-1)
    if conserve_flux:
        img = img / (scale * scale)
    return img


def crop_fractions(
    mode: str,
    crop_p: float,
    native_hw: Tuple[int, int] = NATIVE_HW,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[float, float]:
    """(top_p, left_p) crop-origin fractions per the reference `Crop` modes.

    `boresight` centres on detector pixel (y=224, x=244) of the native
    (411, 403) image (`transforms/crop.py:47-50`).
    """
    if mode == "random":
        rng = rng or np.random.default_rng()
        return (
            float(rng.uniform(0.0, 1.0 - crop_p)),
            float(rng.uniform(0.0, 1.0 - crop_p)),
        )
    if mode == "center":
        return ((1.0 - crop_p) / 2.0,) * 2
    if mode == "boresight":
        h, w = native_hw
        return (224.0 / h - 0.5 * crop_p, 244.0 / w - 0.5 * crop_p)
    raise ValueError(f"Unknown crop mode {mode!r}")


def crop(img: Array, crop_p: float, top_p: float, left_p: float) -> Array:
    """Crop trailing (H, W) to a crop_p fraction, origin at (top_p, left_p).

    Sizes are static given static crop_p; matches `Crop.crop_image`
    (`transforms/crop.py:17-33`) including the edge clamp.
    """
    if crop_p == 1.0:
        return img
    h, w = img.shape[-2], img.shape[-1]
    h_res, w_res = int(h * crop_p), int(w * crop_p)
    top = min(int(top_p * h), h - h_res)
    left = min(int(left_p * w), w - w_res)
    return img[..., top : top + h_res, left : left + w_res]


@partial(jax.jit, static_argnames=("res", "max_val", "mode", "scale"))
def preprocess(
    img: Array,
    det_mask: Optional[Array],
    *,
    res: int,
    max_val: float,
    mode: str,
    scale: int = 1,
) -> Array:
    """Fused mask -> (upsample) -> pad -> clamp/divide/stretch/clamp.

    One jitted elementwise pass replacing the reference's sequential host-side
    chain (`dataset.py:237-243` + `normalize.py:66-82`). Accepts (..., H, W);
    the detector mask broadcasts over leading dims.
    """
    if det_mask is not None:
        img = img * det_mask
    if scale != 1:
        img = upsample_nearest(img, scale)
    img = pad_to_res(img, res)
    return normalize(img, max_val, mode)


@partial(jax.jit, static_argnames=("res", "max_val", "mode", "extra"))
def preprocess_combine(
    imgs: Array,
    det_mask: Optional[Array],
    *,
    res: int,
    max_val: float,
    mode: str,
    extra: int = 0,
) -> Array:
    """Fused composite: sum(img, agn, bkg, ...) -> mask -> pad -> normalize.

    `imgs` stacks the base image plus `extra` additive components along axis 0
    (shape (1+extra, ..., H, W)); replaces `_load_and_combine_simulations`
    (`dataset.py:24-49`) with a single device pass.
    """
    img = jnp.sum(imgs, axis=0) if extra else imgs[0]
    if det_mask is not None:
        img = img * det_mask
    img = pad_to_res(img, res)
    return normalize(img, max_val, mode)
