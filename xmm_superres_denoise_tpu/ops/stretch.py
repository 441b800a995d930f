"""Intensity stretches and normalization as pure jnp functions.

Re-implements the semantics of the reference `Normalize` transform
(`/root/reference/xmm_superres_denoise/transforms/normalize.py:4-107`) in a
functional, jit/vmap/grad-friendly form: no classes holding tensors, just
closed-over Python floats (static under jit) and `jnp` math, so the whole
clamp->divide->stretch->clamp chain fuses into one XLA elementwise kernel.

Stretch modes and their exact constants:
  * linear : identity
  * sqrt   : sqrt / square
  * log    : DS9-style log a=1000,  log(a*x+1)/log(a)          (normalize.py:23-32)
  * asinh  : a=0.02, asinh(x/a)/asinh(1/a)                      (normalize.py:4-19)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax.numpy as jnp

Array = jnp.ndarray

_ASINH_A = 0.02
_LOG_A = 1000.0


def _stretch_linear(x: Array) -> Array:
    return x


def _stretch_sqrt(x: Array) -> Array:
    return jnp.sqrt(x)


def _destretch_sqrt(x: Array) -> Array:
    return jnp.square(x)


def _stretch_log(x: Array) -> Array:
    return jnp.log(_LOG_A * x + 1.0) / jnp.log(_LOG_A)


def _destretch_log(x: Array) -> Array:
    return (jnp.power(_LOG_A, x) - 1.0) / _LOG_A


def _stretch_asinh(x: Array) -> Array:
    return jnp.arcsinh(x / _ASINH_A) / float(jnp.arcsinh(1.0 / _ASINH_A))


def _destretch_asinh(x: Array) -> Array:
    return _ASINH_A * jnp.sinh(x * float(jnp.arcsinh(1.0 / _ASINH_A)))


STRETCH_FNS: dict[str, Tuple[Callable[[Array], Array], Callable[[Array], Array]]] = {
    "linear": (_stretch_linear, _stretch_linear),
    "sqrt": (_stretch_sqrt, _destretch_sqrt),
    "log": (_stretch_log, _destretch_log),
    "asinh": (_stretch_asinh, _destretch_asinh),
}

STRETCH_MODES = tuple(STRETCH_FNS)


def stretch(x: Array, mode: str) -> Array:
    """Apply the named stretch to an already [0,1]-normalized image."""
    try:
        return STRETCH_FNS[mode][0](x)
    except KeyError:
        raise ValueError(f"Unknown stretch mode {mode!r}; options: {STRETCH_MODES}")


def destretch(x: Array, mode: str) -> Array:
    try:
        return STRETCH_FNS[mode][1](x)
    except KeyError:
        raise ValueError(f"Unknown stretch mode {mode!r}; options: {STRETCH_MODES}")


def normalize(x: Array, max_val: float, mode: str = "linear") -> Array:
    """clamp[0,max] -> /max -> stretch -> clamp[0,1].

    Matches `Normalize.normalize_image` (normalize.py:66-82) for max_val > 0.
    For max_val <= 0 the reference divides by the image max; that dynamic
    branch is kept out of the jit path — callers should pass a positive max.
    """
    x = jnp.clip(x, 0.0, max_val) / max_val
    x = stretch(x, mode)
    return jnp.clip(x, 0.0, 1.0)


def denormalize(x: Array, max_val: float, mode: str = "linear") -> Array:
    """Inverse of :func:`normalize`: destretch -> *max -> clamp[0,max].

    Matches `Normalize.denormalize_image` (normalize.py:84-92).
    """
    x = destretch(x, mode)
    x = x * max_val
    return jnp.clip(x, 0.0, max_val)


@dataclass(frozen=True)
class Normalizer:
    """Paired lr/hr normalization spec (config-level object, jit-static).

    Functional stand-in for the reference `Normalize` class: `lr_max`/`hr_max`
    are the clamp maxima from the dataset config, `mode` the stretch.
    """

    lr_max: float
    hr_max: float
    mode: str = "linear"

    def normalize_lr(self, x: Array) -> Array:
        return normalize(x, self.lr_max, self.mode)

    def normalize_hr(self, x: Array) -> Array:
        return normalize(x, self.hr_max, self.mode)

    def denormalize_lr(self, x: Array) -> Array:
        return denormalize(x, self.lr_max, self.mode)

    def denormalize_hr(self, x: Array) -> Array:
        return denormalize(x, self.hr_max, self.mode)

    # Bare stretch/destretch (no clamping/scaling) — used by the metric
    # collection's per-stretch re-scaling (xmm_metric_collection.py:135-143).
    def stretch_only(self, x: Array) -> Array:
        return stretch(x, self.mode)

    def destretch_only(self, x: Array) -> Array:
        return destretch(x, self.mode)
