"""Differentiable image-quality metric functionals (core suite), NHWC jnp.

On-device replacements for the torchmetrics-backed core metric suite of the
reference (`/root/reference/xmm_superres_denoise/metrics/metrics.py:30-39`,
`xmm_metric_collection.py:14-38`): PSNR, SSIM, MS-SSIM, L1, L2, PoissonNLL.
The extended piq-backed suite (VIF-p, FSIM, GMSD, MS-GMSD, HaarPSI, MDSI)
lives in `extended.py`.

Conventions:
  * All functions take (preds, target) as NHWC float arrays and return scalars
    (batch-reduced, matching each torchmetrics reduction).
  * `data_range` defaults to 1.0 — images here are clamped to [0, 1] by
    construction. (torchmetrics would infer the range from running target
    min/max; for [0,1] X-ray images with masked-zero borders that is ~1.)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ssim import ms_ssim_per_image, ssim_per_image

Array = jnp.ndarray


def l1(preds: Array, target: Array) -> Array:
    """Mean absolute error over all elements (torchmetrics MeanAbsoluteError)."""
    return jnp.mean(jnp.abs(preds - target))


def l2(preds: Array, target: Array) -> Array:
    """Mean squared error over all elements (torchmetrics MeanSquaredError)."""
    return jnp.mean(jnp.square(preds - target))


def psnr(preds: Array, target: Array, data_range: float = 1.0) -> Array:
    """Peak signal-to-noise ratio, 10*log10(range^2 / mse)."""
    mse = jnp.mean(jnp.square(preds - target))
    return 10.0 * jnp.log10(data_range**2 / mse)


def poisson_nll(preds: Array, target: Array, eps: float = 1e-8) -> Array:
    """torch.nn.functional.poisson_nll_loss(log_input=False, full=False).

    loss = preds - target * log(preds + eps), mean-reduced. Matches the
    reference PoissonNLLLoss metric (metrics.py:30-39).
    """
    return jnp.mean(preds - target * jnp.log(preds + eps))


def ssim(
    preds: Array,
    target: Array,
    data_range: float = 1.0,
    kernel_size: int = 13,
    sigma: float = 2.5,
    k1: float = 0.01,
    k2: float = 0.05,
) -> Array:
    """Batch-mean SSIM with the reference's kernel config."""
    return jnp.mean(
        ssim_per_image(
            preds, target, data_range, kernel_size=kernel_size, sigma=sigma, k1=k1, k2=k2
        )
    )


def ms_ssim(
    preds: Array,
    target: Array,
    data_range: float = 1.0,
    kernel_size: int = 13,
    sigma: float = 2.5,
    k1: float = 0.01,
    k2: float = 0.05,
) -> Array:
    """Batch-mean multi-scale SSIM with the reference's kernel config."""
    return jnp.mean(
        ms_ssim_per_image(
            preds, target, data_range, kernel_size=kernel_size, sigma=sigma, k1=k1, k2=k2
        )
    )


CORE_METRICS = {
    "psnr": psnr,
    "ssim": ssim,
    "ms_ssim": ms_ssim,
    "l1": l1,
    "l2": l2,
    "poisson": poisson_nll,
}
