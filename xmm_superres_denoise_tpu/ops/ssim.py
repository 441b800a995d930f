"""SSIM / MS-SSIM on NHWC images via depthwise convolutions.

Implements the exact computation pattern of torchmetrics'
StructuralSimilarityIndexMeasure / MultiScaleStructuralSimilarityIndexMeasure
as configured by the reference (kernel_size=13, sigma=2.5, k2=0.05 —
`/root/reference/xmm_superres_denoise/metrics/xmm_metric_collection.py:22-27`,
`utils/loss_functions.py:32-33`):

  * Gaussian window (normalized 13x13, sigma 2.5).
  * Reflect-pad by k//2, VALID depthwise conv, then crop k//2 off each side —
    the mean is over the interior (H-2p, W-2p) region.
  * MS-SSIM: 5 scales, betas (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), 2x2
    average pooling between scales, ReLU normalization of the contrast
    sensitivities, product of stack**betas.

All functions are pure jnp -> differentiable, jittable, vmappable; the
13-tap separable Gaussian runs as two depthwise convs which XLA maps onto the
TPU's convolution units.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

MS_SSIM_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def gaussian_kernel_1d(kernel_size: int = 13, sigma: float = 2.5) -> np.ndarray:
    """Normalized 1-D Gaussian taps (matches torchmetrics' _gaussian)."""
    half = kernel_size // 2
    x = np.arange(-half, -half + kernel_size, dtype=np.float64)
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: Array, taps: Array) -> Array:
    """Separable depthwise Gaussian filter, VALID padding. x: (N, H, W, C).

    Uses HIGHEST precision: metric fidelity must hold on TPU, where f32 convs
    otherwise run through the MXU at reduced (bf16-accumulated) precision.
    """
    c = x.shape[-1]
    k = taps.shape[0]
    kh = jnp.tile(taps.reshape(k, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    kw = jnp.tile(taps.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x


def _reflect_pad(x: Array, pad: int) -> Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


@partial(
    jax.jit,
    static_argnames=("kernel_size", "sigma", "k1", "k2", "return_cs"),
)
def ssim_per_image(
    preds: Array,
    target: Array,
    data_range: float | Array = 1.0,
    *,
    kernel_size: int = 13,
    sigma: float = 2.5,
    k1: float = 0.01,
    k2: float = 0.05,
    return_cs: bool = False,
) -> Array | Tuple[Array, Array]:
    """Per-image SSIM (and optionally contrast sensitivity), shape (N,).

    NHWC inputs. Follows torchmetrics' _ssim_update: reflect pad -> gaussian
    depthwise conv (VALID) -> crop pad -> interior mean.
    """
    taps = jnp.asarray(gaussian_kernel_1d(kernel_size, sigma))
    pad = kernel_size // 2

    p = _reflect_pad(preds, pad)
    t = _reflect_pad(target, pad)

    mu_p = _depthwise_blur(p, taps)
    mu_t = _depthwise_blur(t, taps)
    mu_pp = _depthwise_blur(p * p, taps)
    mu_tt = _depthwise_blur(t * t, taps)
    mu_pt = _depthwise_blur(p * t, taps)

    mu_p_sq = mu_p * mu_p
    mu_t_sq = mu_t * mu_t
    sigma_p = mu_pp - mu_p_sq
    sigma_t = mu_tt - mu_t_sq
    sigma_pt = mu_pt - mu_p * mu_t

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    upper = 2.0 * sigma_pt + c2
    lower = sigma_p + sigma_t + c2
    ssim_map = ((2.0 * mu_p * mu_t + c1) * upper) / ((mu_p_sq + mu_t_sq + c1) * lower)

    # Crop k//2 off each side (torchmetrics crops the padded-border region).
    ssim_map = ssim_map[:, pad:-pad, pad:-pad, :]
    ssim = jnp.mean(ssim_map.reshape(ssim_map.shape[0], -1), axis=-1)
    if not return_cs:
        return ssim
    cs_map = (upper / lower)[:, pad:-pad, pad:-pad, :]
    cs = jnp.mean(cs_map.reshape(cs_map.shape[0], -1), axis=-1)
    return ssim, cs


def _avg_pool_2x2(x: Array) -> Array:
    n, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2, :]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


@partial(
    jax.jit,
    static_argnames=("kernel_size", "sigma", "k1", "k2", "normalize"),
)
def ms_ssim_per_image(
    preds: Array,
    target: Array,
    data_range: float | Array = 1.0,
    *,
    kernel_size: int = 13,
    sigma: float = 2.5,
    k1: float = 0.01,
    k2: float = 0.05,
    normalize: str = "relu",
) -> Array:
    """Per-image multi-scale SSIM, shape (N,). torchmetrics semantics."""
    min_side = min(preds.shape[1], preds.shape[2])
    needed = kernel_size * 2 ** (len(MS_SSIM_BETAS) - 1)
    if min_side < needed:
        raise ValueError(
            f"MS-SSIM with kernel {kernel_size} needs images >= {needed} px per "
            f"side (5 halving scales); got {preds.shape[1]}x{preds.shape[2]}"
        )
    betas = jnp.asarray(MS_SSIM_BETAS)
    mcs = []
    sim = None
    p, t = preds, target
    for i in range(len(MS_SSIM_BETAS)):
        sim, cs = ssim_per_image(
            p,
            t,
            data_range,
            kernel_size=kernel_size,
            sigma=sigma,
            k1=k1,
            k2=k2,
            return_cs=True,
        )
        mcs.append(cs)
        if i < len(MS_SSIM_BETAS) - 1:
            p = _avg_pool_2x2(p)
            t = _avg_pool_2x2(t)
    mcs[-1] = sim
    stack = jnp.stack(mcs)  # (scales, N)
    if normalize == "relu":
        stack = jax.nn.relu(stack)
    weighted = stack ** betas[:, None]
    return jnp.prod(weighted, axis=0)
