"""Composite weighted metric-loss with per-stretch affine scaling.

Functional rebuild of the reference's torchmetrics-arithmetic loss
(`/root/reference/xmm_superres_denoise/utils/loss_functions.py:11-47`):

    loss(preds, target) = sum_i  p_i * scaling_i * metric_i(preds, target)
                          + sum_i correction_i        (for included terms)

where metric_i in {l1, poisson, psnr, ssim, ms_ssim}, p_i are the LossCfg
relative percentages (sum in (0, 1]), and scaling/correction come from the
per-stretch tables in `res/configs/loss_functions.toml` (carried over
verbatim — the values are science-critical calibration from the paper).
SSIM/MS-SSIM use kernel 13 / sigma 2.5 / k2 0.05 (loss_functions.py:32-33).

The returned callable is a pure jnp function of (preds, target) — suitable
for `jax.value_and_grad` inside the jitted train step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

from ..config.schema import LossCfg
from ..metrics.functional import l1, ms_ssim, poisson_nll, psnr, ssim

Array = jnp.ndarray
LossFn = Callable[[Array, Array], Array]

_TERMS: Dict[str, LossFn] = {
    "l1": l1,
    "poisson": poisson_nll,
    "psnr": psnr,
    "ssim": ssim,
    "ms_ssim": ms_ssim,
}


def create_loss(
    sc_dict: Optional[Dict[str, Dict[str, float]]],
    loss_config: LossCfg,
) -> LossFn:
    """Build the weighted composite loss (loss_functions.py:11-47 semantics).

    `sc_dict` is the stretch-specific `{metric: {scaling, correction}}` table
    (already selected for the dataset's stretch mode), or None to disable
    scaling. Terms with weight 0 are dropped at build time so the jitted loss
    only computes what it needs.
    """
    weights = {
        "l1": loss_config.l1,
        "poisson": loss_config.poisson,
        "psnr": loss_config.psnr,
        "ssim": loss_config.ssim,
        "ms_ssim": loss_config.ms_ssim,
    }

    terms = []
    correction = 0.0
    for name, p in weights.items():
        if p <= 0.0:
            continue
        if sc_dict is not None and name in sc_dict:
            p = p * sc_dict[name]["scaling"]
            correction += sc_dict[name]["correction"]
        terms.append((name, p, _TERMS[name]))

    assert terms, "Loss config selected no terms"
    # Reference adds the accumulated correction only when positive
    # (loss_functions.py:44-45).
    corr = correction if correction > 0.0 else 0.0

    def loss_fn(preds: Array, target: Array) -> Array:
        total = jnp.asarray(corr, jnp.float32)
        for _, p, fn in terms:
            total = total + p * fn(preds, target)
        return total

    loss_fn.terms = terms  # introspection for logging/tests
    loss_fn.correction = corr
    return loss_fn


def load_scaling_tables(loss_toml: dict, stretch_mode: str):
    """Extract (sc_dict, LossCfg) from a parsed loss_functions.toml dict.

    Mirrors train.py:46-53: `use_scaling` gates the per-stretch table lookup.
    """
    cfg = dict(loss_toml["loss"])
    sc_dict = None
    if cfg.pop("use_scaling"):
        sc_dict = loss_toml["scaling"][stretch_mode]
    return sc_dict, LossCfg(**cfg)
