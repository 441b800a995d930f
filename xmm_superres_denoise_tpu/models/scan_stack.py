"""Param-layout converters between unrolled and scan-compressed layer stacks.

The scan-compressed models (`DRCT(scan_layers=True)`, `HAT(scan_layers=True)`)
trace ONE group body and `lax.scan` it over stacked per-group parameters —
collapsing the production train graphs ~6x (the unrolled DRCT/HAT train
graphs lowered to ~180 MB MLIR, past the dev runtime's remote AOT compile
helper cap; docs/TRAINING.md). The math is exactly the unrolled model's
(tests/test_scan_layers.py), but the parameter pytree differs:

  unrolled:  params["layers_0"] ... params["layers_{n-1}"]   (n subtrees)
  scanned:   params["layers_scan"]                           (leaves stacked
                                                              on axis 0)

These helpers convert checkpoints/initializations between the two layouts,
so ONNX export (torch-compatible names need the unrolled layout) and
scan-training interoperate.
"""

from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp

_LAYER_RE = re.compile(r"^layers_(\d+)$")


def scanned_group_module(body_cls, *, length: int, use_checkpoint: bool,
                         name: str = "layers_scan", **module_kwargs):
    """Construct the scan-compressed group-stack module (one authority for
    the nn.scan/nn.remat wiring shared by DRCT/HAT/SwinIR).

    `body_cls` must expose `scan_step(self, x, rates, x_size,
    deterministic) -> (x, ())` — carry first, then the scanned per-group
    drop-path rates, then two broadcast args (hence in_axes/static_argnums
    below: remat's static_argnums count self as 0). Call the result's
    `.scan_step(x, rates, x_size, deterministic)`."""
    from flax import linen as nn

    body = body_cls
    if use_checkpoint:
        # remat the WHOLE scanned group body (per-block remat inside would
        # nest a second remat for no extra memory win)
        body = nn.remat(body, static_argnums=(3, 4), methods=["scan_step"])
    return nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True, "droppath": True},
        in_axes=(0, nn.broadcast, nn.broadcast),
        length=length,
        methods=["scan_step"],
    )(name=name, **module_kwargs)


def stack_layer_params(
    params: Dict, dest: str = "layers_scan"
) -> Dict:
    """Unrolled -> scanned: stack `layers_i` subtrees on a new leading axis.

    `params` is the model's "params" collection (not the outer {"params": ...}
    wrapper). Raises if the per-group subtrees are not structurally equal."""
    idx = sorted(
        (int(m.group(1)), k)
        for k in params
        if (m := _LAYER_RE.match(k))
    )
    if not idx:
        raise ValueError("no layers_<i> subtrees to stack")
    found = [i for i, _ in idx]
    if found != list(range(len(idx))):
        raise ValueError(
            "layers_<i> indices are not contiguous from 0 "
            f"(found {found}); a gapped tree would silently restack "
            "under renumbered group identities"
        )
    groups = [params[k] for _, k in idx]
    treedefs = {jax.tree_util.tree_structure(g) for g in groups}
    if len(treedefs) != 1:
        raise ValueError(
            "layer groups are not structurally identical - cannot scan-stack"
        )
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *groups
    )
    out = {k: v for k, v in params.items() if not _LAYER_RE.match(k)}
    out[dest] = stacked
    return out


def unstack_layer_params(
    params: Dict, src: str = "layers_scan", prefix: str = "layers_"
) -> Dict:
    """Scanned -> unrolled: split the stacked axis back into `layers_i`."""
    if src not in params:
        raise ValueError(f"no {src!r} subtree to unstack")
    stacked = params[src]
    leaves = jax.tree_util.tree_leaves(stacked)
    if not leaves:
        raise ValueError(f"{src!r} subtree is empty")
    n = leaves[0].shape[0]
    out = {k: v for k, v in params.items() if k != src}
    for i in range(n):
        out[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked
        )
    return out
