"""Orbax checkpointing with best-val/loss tracking and resume.

Replaces Lightning's ModelCheckpoint/resume machinery
(`/root/reference/train.py:133-139,157-171`): checkpoints are orbax pytrees
of the full TrainState plus metadata; the manager keeps the best checkpoint
by minimum `val/loss` (the reference's monitor, train.py:134-136) alongside
the latest for resume.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, root: Path, max_to_keep: int = 3):
        self.root = Path(root).resolve()
        self.root.mkdir(parents=True, exist_ok=True)
        from orbax.checkpoint.checkpoint_managers import preservation_policy

        # best_fn + max_to_keep alone builds a BestN-ONLY retention policy:
        # once val/loss starts worsening, every NEW step is deleted right
        # after it is saved and resume-from-latest silently rewinds to the
        # best epoch. Preserve the latest step alongside the best N.
        self._mngr = ocp.CheckpointManager(
            self.root / "ckpts",
            options=ocp.CheckpointManagerOptions(
                preservation_policy=preservation_policy.AnyPreservationPolicy(
                    policies=[
                        preservation_policy.LatestN(n=1),
                        preservation_policy.BestN(
                            get_metric_fn=lambda m: m["val_loss"],
                            reverse=True,  # == best_mode "min"
                            n=max_to_keep,
                        ),
                    ]
                ),
                best_fn=lambda m: m["val_loss"],
                best_mode="min",
            ),
        )
        self._meta_path = self.root / "best.json"

    def save(self, step: int, state: Any, val_loss: float) -> None:
        import math

        # A non-finite monitor (e.g. NaN from an empty val split) must not
        # participate in best-N retention ordering (sorting with NaN keys is
        # undefined) nor ever be recorded as "best"; +inf keeps the ordering
        # sane and LatestN still preserves the step for resume.
        metric = float(val_loss) if math.isfinite(val_loss) else float("inf")
        self._mngr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={"val_loss": metric},
        )
        self._mngr.wait_until_finished()
        best = self.best_metadata() or {"val_loss": float("inf")}
        if math.isfinite(val_loss) and float(val_loss) <= best["val_loss"]:
            self._meta_path.write_text(
                json.dumps({"step": int(step), "val_loss": float(val_loss)})
            )

    def best_metadata(self) -> Optional[dict]:
        if self._meta_path.exists():
            return json.loads(self._meta_path.read_text())
        return None

    def restore(self, state_template: Any, step: Optional[int] = None) -> Tuple[Any, int]:
        """Restore `step` (or the latest) into the template's structure."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.root}")
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, int(step)

    def restore_best(self, state_template: Any) -> Tuple[Any, int]:
        meta = self.best_metadata()
        step = self._mngr.best_step() if meta is None else meta["step"]
        if step is None:
            raise FileNotFoundError(f"No best checkpoint under {self.root}")
        return self.restore(state_template, step)

    def save_emergency(self, state: Any) -> Path:
        """One-off crash snapshot, written on ANY exception escaping the fit
        loop (SURVEY.md §5.3 failure handling) — separate from the stepped
        manager so it never perturbs best/latest bookkeeping."""
        import shutil

        path = self.root / "emergency"
        if path.exists():
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()
        return path

    def restore_emergency(self, state_template: Any) -> Any:
        path = self.root / "emergency"
        if not path.exists():
            raise FileNotFoundError(f"No emergency checkpoint under {self.root}")
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, state_template)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.close()


def _keypath_name(keypath) -> str:
    """Stable string for a tree keypath entry: DictKey has .key, GetAttrKey
    has .name, SequenceKey has an int .idx — all must stringify."""
    parts = []
    for k in keypath:
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def save_params_npz(path: Path, params: Any) -> None:
    """Flat .npz export of a parameter pytree (portable deployment format,
    filling the role of the reference's shipped ONNX weight files)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        out[_keypath_name(keypath)] = np.asarray(leaf)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **out)


def load_params_npz(path: Path, params_template: Any) -> Any:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for keypath, leaf in flat:
        name = _keypath_name(keypath)
        arr = data[name]
        if arr.shape != leaf.shape:
            raise ValueError(f"{name}: shape {arr.shape} != template {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template), leaves
    )
