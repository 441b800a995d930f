"""Jitted train/eval step factories: shard_map data-parallel over a mesh.

The TPU-native core of the harness, replacing the reference's Lightning
training_step/validation_step + DDP/FSDP machinery
(`/root/reference/xmm_superres_denoise/models/model.py:51-151`,
`train.py:141-155`):

  * Train step: `shard_map` over the `data` mesh axis — each shard computes
    the weighted per-sample loss on its local batch slice; the cross-shard
    gradient sum rides the psum autodiff inserts for the replicated params
    (over ICI — the XLA-collective equivalent of NCCL all-reduce), and the
    optax update runs identically on every device, keeping params replicated.
  * Optional FSDP axis: parameters sharded over `fsdp` via NamedSharding
    out-shardings; XLA's SPMD partitioner inserts the all-gathers and
    reduce-scatters (the GSPMD idiom replacing torch FSDP wrapping).
  * Eval step: per-shard forward + weighted metric/loss accumulation with
    `lax.psum`-reduced state deltas (torchmetrics `dist_reduce_fx="sum"`
    equivalent, metrics.py:16-21), so accumulated state stays replicated.

Batches are dicts {"lr": (B,H,W,C), "hr": (B,H',W',C), "weight": (B,)} with B
divisible by the data-axis size (the loader pads; `weight`=0 marks padding).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import DATA_AXIS

Array = jnp.ndarray
Batch = Dict[str, Array]


def _cast_floating(tree: Any, dtype) -> Any:
    """Cast every floating leaf of a pytree (mixed-precision compute copy)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


class TrainState(NamedTuple):
    """Minimal functional train state (params + optimizer state + step)."""

    step: Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(jnp.zeros((), jnp.int32), params, tx.init(params))


def make_train_step(
    apply_fn: Callable[[Any, Array], Array],
    loss_fn: Callable[[Array, Array], Array],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    donate: bool = True,
    compute_dtype: Optional[Any] = None,
):
    """Build the jitted data-parallel train step.

    apply_fn(params, lr_batch) -> preds (already clamped by the model).
    The update is the weighted mean of per-sample gradients over all real
    (weight>0) samples — Lightning-DDP's mean-of-gradients semantics, made
    invariant to the loader's divisibility padding.

    `compute_dtype=jnp.bfloat16` enables TPU mixed-precision training:
    master params, loss, gradients, and the optax update all stay f32
    (bf16 shares f32's exponent range, so no loss scaling is needed), and
    only the model forward/backward runs in bf16 — the params are cast
    INSIDE the differentiated function, so autodiff emits f32 cotangents
    at the cast boundary. The reference's GPU trainer has no equivalent
    (Lightning `precision` is never set, train.py:148-155); on the MXU
    bf16 matmuls/convs run at twice the f32 rate.
    """

    def _shard_step(
        state: TrainState, lr: Array, hr: Array, w: Array
    ) -> Tuple[TrainState, Array]:
        # Weighted per-sample loss (sum w_i * loss_i / psum sum w) so padded
        # rows (weight=0 duplicates from pad_batch_to_devices) contribute
        # exactly nothing to the gradient — the train step is invariant to
        # B % n_devices, mirroring the eval path below.
        #
        # Collective subtlety (empirically pinned by
        # tests/test_train_loop.py::test_padded_train_step_matches_unpadded):
        # under shard_map, differentiating a shard-varying loss w.r.t. the
        # REPLICATED (P()) params makes autodiff insert the cross-shard psum
        # itself — `grads` below is already the global sum of w_i * dl_i.
        # Adding an explicit psum double-counts by the axis size (and the
        # round-2 pmean pattern was an identity, leaving grads scaled by
        # n_devices). The only reduction needed is the global weight-sum
        # divide.
        wsum = lax.psum(jnp.sum(w), DATA_AXIS)

        def loss_of(p):
            x = lr
            if compute_dtype is not None:
                p = _cast_floating(p, compute_dtype)
                x = lr.astype(compute_dtype)
            preds = apply_fn(p, x).astype(jnp.float32)  # loss stays f32
            per_sample = jax.vmap(lambda pr, t: loss_fn(pr[None], t[None]))(
                preds, hr
            )
            return jnp.sum(per_sample * w)

        lsum, grads = jax.value_and_grad(loss_of)(state.params)
        grads = jax.tree_util.tree_map(lambda g: g / wsum, grads)
        loss = lax.psum(lsum, DATA_AXIS) / wsum
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    sharded = shard_map(
        _shard_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Batch) -> Tuple[TrainState, Array]:
        w = batch.get("weight")
        if w is None:
            w = jnp.ones((batch["lr"].shape[0],), jnp.float32)
        return sharded(state, batch["lr"], batch["hr"], w)

    return train_step


def make_accum_steps(
    apply_fn: Callable[[Any, Array], Array],
    loss_fn: Callable[[Array, Array], Array],
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    compute_dtype: Optional[Any] = None,
    donate: bool = True,
):
    """(grad_step, apply_step) pair for gradient accumulation.

    The reference's Lightning trainer exposes `accumulate_grad_batches`;
    this is its TPU-native equivalent, EXACT w.r.t. one big batch: the
    loss is the weighted mean over samples, so accumulating the
    (numerator-gradient, loss-sum, weight-sum) triple over micro-batches
    and dividing once reproduces the big-batch update bit-for-bit modulo
    f32 summation order (pinned by tests/test_grad_accum.py). Memory cost
    over a plain step is one params-sized f32 gradient pytree.

      grad_step(params, batch) -> (grads_sum, loss_sum, weight_sum)
          global (cross-shard) sums of d/dp [sum_i w_i loss_i], of
          sum_i w_i loss_i, and of sum_i w_i for this micro-batch.
      apply_step(state, grads_sum, loss_sum, weight_sum)
          -> (state, mean_loss): divide, optax update, apply.

    With `mesh`, grad_step runs as a shard_map over the data axis (the DP
    path — autodiff inserts the cross-shard psum for the replicated
    params, see make_train_step's collective subtlety note); without, it
    is a plain jit for the GSPMD/FSDP path (sharding propagation handles
    the reductions). `compute_dtype` applies the same mixed-precision
    contract as make_train_step.
    """

    def _micro(params, lr, hr, w, *, psum: bool):
        def loss_of(p):
            x = lr
            if compute_dtype is not None:
                p = _cast_floating(p, compute_dtype)
                x = lr.astype(compute_dtype)
            preds = apply_fn(p, x).astype(jnp.float32)
            per_sample = jax.vmap(lambda pr, t: loss_fn(pr[None], t[None]))(
                preds, hr
            )
            return jnp.sum(per_sample * w)

        lsum, grads = jax.value_and_grad(loss_of)(params)
        wsum = jnp.sum(w)
        if psum:
            lsum = lax.psum(lsum, DATA_AXIS)
            wsum = lax.psum(wsum, DATA_AXIS)
        return grads, lsum, wsum

    if mesh is not None:
        sharded = shard_map(
            partial(_micro, psum=True),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), P()),
        )
    else:
        sharded = partial(_micro, psum=False)

    @jax.jit
    def grad_step(params, batch: Batch):
        w = batch.get("weight")
        if w is None:
            w = jnp.ones((batch["lr"].shape[0],), jnp.float32)
        return sharded(params, batch["lr"], batch["hr"], w)

    # donate=False for callers whose `state` aliases a params pytree they
    # keep using (tests/notebooks); the fit loop threads state and donates.
    @partial(jax.jit, donate_argnums=(0, 1) if donate else (1,))
    def apply_step(state: TrainState, grads_sum, loss_sum, weight_sum):
        grads = jax.tree_util.tree_map(lambda g: g / weight_sum, grads_sum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, params, opt_state),
            loss_sum / weight_sum,
        )

    return grad_step, apply_step


@jax.jit
def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def accum_add(acc, delta):
    """Accumulate (grads, loss_sum, weight_sum) triples (jitted tree-add).

    One jitted call per accumulation instead of one `jnp.add` dispatch per
    LEAF: the per-leaf ufunc dispatch storm (hundreds per step) was both
    measurable host overhead and the crash site of a flaky jax-0.9.0-CPU
    abort under long suite runs (round-4 postmortem, README CI note)."""
    if acc is None:
        return delta
    return _tree_add(acc, delta)


def make_eval_step(
    apply_fn: Callable[[Any, Array], Array],
    loss_fn: Callable[[Array, Array], Array],
    mesh: Mesh,
    metric_updaters: Optional[
        Dict[str, Callable[[Any, Array, Array, Array], Any]]
    ] = None,
    upsample_input: int = 1,
):
    """Build the jitted eval step.

    `apply_fn(params, x)` takes the parameters EXPLICITLY — passing them as
    a jit argument rather than a closed-over constant lets one compiled
    step serve every epoch (a closure would bake the epoch's weights into
    the executable and recompile per epoch).

    `metric_updaters` maps state-key ->
    update(state, preds_or_lr, target, w, axis_name): the updater runs on a
    batch SHARD and its state delta is psum'd over `axis_name`, so
    mean-style metrics must normalize globally (collection.batch_mean_delta).
    The special key prefix "in:" receives the (upsampled) INPUT instead of
    the prediction — the reference's input-baseline metrics (model.py:90-105).
    Returns (new_states, loss_sum_delta, weight_sum_delta).
    """
    metric_updaters = metric_updaters or {}

    def _shard_eval(params, states, lr, hr, w):
        preds = apply_fn(params, lr)
        target = hr
        # Per-sample losses weighted by w so padded rows (w=0, duplicated
        # last sample — parallel/mesh.py pad_batch) contribute exactly
        # nothing: val/loss is invariant to B % n_devices. The reference
        # never pads (Lightning drops/redistributes), model.py:87-105.
        per_sample = jax.vmap(lambda p, t: loss_fn(p[None], t[None]))(
            preds, target
        )
        loss_delta = lax.psum(jnp.sum(per_sample * w), DATA_AXIS)
        n_delta = lax.psum(jnp.sum(w), DATA_AXIS)

        lr_up = lr
        if upsample_input != 1:
            from ..ops.preprocess import upsample_nearest

            lr_up = upsample_nearest(
                lr.transpose(0, 3, 1, 2), upsample_input
            ).transpose(0, 2, 3, 1)

        new_states = {}
        for key, update in metric_updaters.items():
            src = lr_up if key.startswith("in:") else preds
            st = states[key]
            new = update(st, src, target, w, DATA_AXIS)
            # psum the delta so replicated state stays identical on all shards
            delta = jax.tree_util.tree_map(lambda a, b: b - a, st, new)
            delta = lax.psum(delta, DATA_AXIS)
            new_states[key] = jax.tree_util.tree_map(
                lambda a, d: a + d, st, delta
            )
        return new_states, loss_delta, n_delta

    sharded = shard_map(
        _shard_eval,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P()),
    )

    @jax.jit
    def eval_step(params, states, batch: Batch):
        w = batch.get("weight")
        if w is None:
            w = jnp.ones((batch["lr"].shape[0],), jnp.float32)
        return sharded(params, states, batch["lr"], batch["hr"], w)

    return eval_step


def make_fsdp_train_step(
    apply_fn: Callable[[Any, Array], Array],
    loss_fn: Callable[[Array, Array], Array],
    tx: optax.GradientTransformation,
    compute_dtype: Optional[Any] = None,
):
    """GSPMD (jit + NamedSharding propagation) train step for FSDP-style runs.

    The XLA-partitioner equivalent of torch FSDP (reference train.py:142-146):
    callers place `state.params`/`state.opt_state` with NamedSharding over the
    `fsdp` mesh axis (see `parallel.sharding.fsdp_shardings`) and the batch
    over `data`; jit propagates those shardings and the SPMD partitioner
    inserts the all-gathers/reduce-scatters that FSDP would do explicitly.
    """

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Batch) -> Tuple[TrainState, Array]:
        w = batch.get("weight")
        if w is None:
            w = jnp.ones((batch["lr"].shape[0],), jnp.float32)

        def loss_of(p):
            x = batch["lr"]
            if compute_dtype is not None:
                # mixed precision: bf16 forward/backward, f32 everything
                # else (see make_train_step's docstring)
                p = _cast_floating(p, compute_dtype)
                x = x.astype(compute_dtype)
            preds = apply_fn(p, x).astype(jnp.float32)
            per_sample = jax.vmap(lambda pr, t: loss_fn(pr[None], t[None]))(
                preds, batch["hr"]
            )
            return jnp.sum(per_sample * w) / jnp.sum(w)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    return train_step
