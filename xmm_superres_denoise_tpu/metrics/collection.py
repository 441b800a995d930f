"""Accumulating metric collections as functional pytree state.

Replaces torchmetrics stateful Metric objects (reference `metrics/metrics.py`,
`xmm_metric_collection.py:114-143`) with an explicit (sums, counts) pytree:

  * `init() -> state`, `update(state, preds, target) -> state` (jittable, runs
    on device inside the eval step), `compute(state) -> {name: float}`.
  * Cross-chip reduction is a `jax.lax.psum` over the state pytree inside
    `shard_map` — the XLA-collective equivalent of torchmetrics'
    `dist_reduce_fx="sum"` states (metrics.py:16-21).

Accumulation semantics mirror each torchmetrics reduction:
  psnr      : (sum_squared_error, n_elements)       -> 10*log10(r^2/(sse/n))
  ssim      : (sum of per-image ssim, n_images)
  ms_ssim   : (sum of per-image ms-ssim, n_images)
  l1/l2     : (sum of abs/sq error, n_elements)
  poisson   : (sum of batch means, n_IMAGES) — the reference's custom
              `_Metric` accumulates one batch-mean per batch but divides by
              the total image count, reproduced as-is (metrics.py:30-39).

Mean-style metrics (poisson + the extended suite) need one extra care under
data parallelism: the eval step psums state DELTAS across the `data` axis,
which is exactly right for sum-style states but would add one shard-mean
PER SHARD for mean-style ones (the reported value would scale with device
count). Updaters therefore take an optional `axis_name`: when set, the
mean is computed over the GLOBAL batch (psum numerator/denominator) and
pre-divided by the axis size so the subsequent delta-psum reconstructs
exactly one global batch-mean.

`XMMMetricCollection` semantics: before each update, preds/target are
de-stretched with the dataset normalizer's bare destretch and re-stretched per
scaling normalizer (xmm_metric_collection.py:135-143); metrics are logged as
`{prefix}/{stretch}/{metric}`.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from ..ops.ssim import ms_ssim_per_image, ssim_per_image
from ..ops.stretch import Normalizer

Array = jnp.ndarray
State = Dict[str, Tuple[Array, Array]]

CORE_METRIC_NAMES = ("psnr", "ssim", "ms_ssim", "l1", "l2", "poisson")


def _per_image_sum(x: Array) -> Array:
    return jnp.sum(x.reshape(x.shape[0], -1), axis=-1)


def _upd_psnr(p: Array, t: Array, w: Array, axis_name=None) -> Tuple[Array, Array]:
    per_img = _per_image_sum(jnp.square(p - t))
    n_per = p.size / p.shape[0]
    return jnp.sum(w * per_img), jnp.sum(w) * n_per


def _upd_ssim(p: Array, t: Array, w: Array, axis_name=None) -> Tuple[Array, Array]:
    return jnp.sum(w * ssim_per_image(p, t)), jnp.sum(w)


def _upd_ms_ssim(p: Array, t: Array, w: Array, axis_name=None) -> Tuple[Array, Array]:
    return jnp.sum(w * ms_ssim_per_image(p, t)), jnp.sum(w)


def _upd_l1(p: Array, t: Array, w: Array, axis_name=None) -> Tuple[Array, Array]:
    per_img = _per_image_sum(jnp.abs(p - t))
    return jnp.sum(w * per_img), jnp.sum(w) * (p.size / p.shape[0])


def _upd_l2(p: Array, t: Array, w: Array, axis_name=None) -> Tuple[Array, Array]:
    per_img = _per_image_sum(jnp.square(p - t))
    return jnp.sum(w * per_img), jnp.sum(w) * (p.size / p.shape[0])


def batch_mean_delta(per_img: Array, w: Array, axis_name=None) -> Array:
    """One GLOBAL weighted batch-mean per update, robust to data parallelism.

    Without `axis_name`: the local weighted mean. With it (inside
    shard_map): numerator/denominator are psum'd so every shard sees the
    global batch mean, then pre-divided by the axis size because the eval
    step psums state deltas — the psum of `mean/n_shards` over shards is
    exactly one global batch-mean, making the reported value invariant to
    the device count (it previously scaled ~linearly with it)."""
    num = jnp.sum(w * per_img)
    den = jnp.sum(w)
    if axis_name is not None:
        num = lax.psum(num, axis_name)
        den = lax.psum(den, axis_name)
        return num / jnp.maximum(den, 1.0) / lax.psum(1.0, axis_name)
    return num / jnp.maximum(den, 1.0)


def _upd_poisson(p: Array, t: Array, w: Array, axis_name=None) -> Tuple[Array, Array]:
    per_img = jnp.mean(
        (p - t * jnp.log(p + 1e-8)).reshape(p.shape[0], -1), axis=-1
    )
    # Reference accumulates batch means / total image count
    # (metrics.py:30-39); the weighted per-image form reduces to that for
    # full batches.
    return batch_mean_delta(per_img, w, axis_name), jnp.sum(w)


_UPDATES: Dict[str, Callable[[Array, Array, Array], Tuple[Array, Array]]] = {
    "psnr": _upd_psnr,
    "ssim": _upd_ssim,
    "ms_ssim": _upd_ms_ssim,
    "l1": _upd_l1,
    "l2": _upd_l2,
    "poisson": _upd_poisson,
}


def _compute_one(name: str, s: Array, n: Array, data_range: float = 1.0) -> Array:
    if name.split("/")[-1] == "psnr":
        return 10.0 * jnp.log10(data_range**2 / (s / n))
    return s / n


class MetricBank:
    """A named set of accumulating metrics with functional state."""

    def __init__(self, names: Sequence[str] = CORE_METRIC_NAMES):
        unknown = [n for n in names if n.split("/")[-1] not in _UPDATES]
        if unknown:
            raise ValueError(f"Unknown metrics: {unknown}")
        self.names = tuple(names)

    def init(self) -> State:
        z = jnp.zeros((), jnp.float32)
        return {n: (z, z) for n in self.names}

    def update(
        self,
        state: State,
        preds: Array,
        target: Array,
        weights: Array | None = None,
        axis_name: Optional[str] = None,
    ) -> State:
        """Accumulate one batch. `weights` is an optional per-sample (B,)
        weight vector (0 for padded samples under data-parallel padding).
        `axis_name` must be set when called on a batch SHARD inside
        shard_map whose state deltas are psum'd (see module docstring)."""
        if weights is None:
            weights = jnp.ones((preds.shape[0],), jnp.float32)
        out = {}
        for n in self.names:
            ds, dn = _UPDATES[n.split("/")[-1]](
                preds, target, weights, axis_name
            )
            s, c = state[n]
            out[n] = (s + ds, c + dn)
        return out

    def compute(self, state: State) -> Dict[str, Array]:
        return {n: _compute_one(n, *state[n]) for n in self.names}


class XMMMetricCollection:
    """Per-stretch-mode metric evaluation (xmm_metric_collection.py:114-143).

    For each scaling normalizer: destretch preds/target with the dataset
    normalizer's inverse stretch, re-stretch with the scaling normalizer's
    stretch, then update a cloned MetricBank. Keys follow the reference's
    `{prefix}/{stretch_mode}/{metric}` layout.
    """

    def __init__(
        self,
        dataset_normalizer: Normalizer,
        scaling_normalizers: Sequence[Normalizer],
        prefix: str,
        metric_names: Sequence[str] = CORE_METRIC_NAMES,
        input_baseline: bool = False,
    ):
        self.dataset_normalizer = dataset_normalizer
        self.scaling_normalizers = list(scaling_normalizers)
        base = "in/" if input_baseline else ""
        self.prefix = prefix
        self.banks = {
            nz.mode: MetricBank(
                [f"{prefix}/{nz.mode}/{base}{m}" for m in metric_names]
            )
            for nz in self.scaling_normalizers
        }

    def init(self) -> Dict[str, State]:
        return {mode: bank.init() for mode, bank in self.banks.items()}

    def update(
        self,
        state: Dict[str, State],
        preds: Array,
        target: Array,
        weights: Array | None = None,
        axis_name: Optional[str] = None,
    ) -> Dict[str, State]:
        preds = self.dataset_normalizer.destretch_only(preds)
        target = self.dataset_normalizer.destretch_only(target)
        out = {}
        for nz in self.scaling_normalizers:
            p = nz.stretch_only(preds)
            t = nz.stretch_only(target)
            out[nz.mode] = self.banks[nz.mode].update(
                state[nz.mode], p, t, weights, axis_name
            )
        return out

    def compute(self, state: Dict[str, State]) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        for mode, bank in self.banks.items():
            out.update(bank.compute(state[mode]))
        return out
