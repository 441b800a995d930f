"""Fit/test orchestration: the shard_map data-parallel JAX trainer.

Replaces the Lightning Trainer + Model wrapper
(`/root/reference/xmm_superres_denoise/train.py:104-171`,
`models/model.py:48-151`) with an explicit loop:

  epoch:
    train: jitted shard_map step per batch (weighted-mean grads over `data`)
    val:   jitted eval step accumulating loss + XMMMetricCollection state
           on-device (psum-reduced), computed/logged at epoch end
    ckpt:  orbax save, best tracked on val/loss (min)
  test:  same eval path with extended + input-baseline collections; input
         metrics computed once (model.py:132-142).

Model output clamping to [0,1] lives in the apply wrapper (model.py:48-49).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import ModelCfg, TrainerCfg
from ..data.datamodule import XmmDataModule
from ..metrics.collection import XMMMetricCollection
from ..models.registry import build_model
from ..ops.stretch import Normalizer
from ..parallel.mesh import FSDP_AXIS, make_mesh, replicate
from .checkpoints import CheckpointManager
from .loss import LossFn
from .steps import (
    TrainState,
    make_eval_step,
    accum_add,
    make_accum_steps,
    make_fsdp_train_step,
    make_train_step,
)

log = logging.getLogger("xmmsr")

# Max staleness of the host-side state mirror backing the emergency
# checkpoint when the crash is the train step itself (whose input buffers
# are donated and therefore unreadable afterwards).
_SNAPSHOT_INTERVAL_S = 60.0


def clamped_apply(model, params, x):
    """forward = clamp(model(x), 0, 1) (reference model.py:48-49)."""
    return jnp.clip(model.apply(params, x), 0.0, 1.0)


@dataclass
class FitResult:
    best_val_loss: float
    best_step: int
    history: List[Dict[str, float]] = field(default_factory=list)


class Trainer:
    def __init__(
        self,
        model_config: ModelCfg,
        trainer_config: TrainerCfg,
        datamodule: XmmDataModule,
        loss_fn: LossFn,
        scaling_normalizers: Optional[List[Normalizer]] = None,
        mesh=None,
        metric_names=None,
    ):
        self.model_config = model_config
        self.trainer_config = trainer_config
        self.metric_names = metric_names  # None -> CORE_METRIC_NAMES
        self.dm = datamodule
        self.loss_fn = loss_fn
        cfg = datamodule.config
        self.lr_shape = (cfg.lr.res, cfg.lr.res)
        hr_res = cfg.hr.res if cfg.hr else cfg.lr.res
        self.hr_shape = (hr_res, hr_res)
        self.scale = self.hr_shape[0] // self.lr_shape[0]

        # Honor the legacy `accelerator` knob observably (the reference's
        # Lightning accelerator switch, train.py:148-155): platform choice
        # must happen before backend init, so a mid-process config can only
        # VERIFY it — mismatches fail loudly instead of silently training on
        # the wrong platform.
        acc = getattr(trainer_config, "accelerator", "auto")
        if acc != "auto":
            backend = jax.default_backend()
            # Exact-match against the active backend (the legacy 'gpu' knob
            # maps onto any non-TPU accelerator backend; 'tpu' also accepts
            # the axon-tunneled TPU plugin): a 'gpu' config on a TPU backend
            # must fail loudly, not just the cpu/non-cpu split.
            accepted = {
                "cpu": {"cpu"},
                "gpu": {"gpu", "cuda", "rocm"},
                "tpu": {"tpu", "axon"},
            }.get(acc, {acc})
            if backend not in accepted:
                raise RuntimeError(
                    f"trainer.accelerator={acc!r} but the JAX backend is "
                    f"{backend!r}. Select the platform before startup (e.g. "
                    "JAX_PLATFORMS=cpu) — it cannot be switched mid-process."
                )

        self.mesh = mesh if mesh is not None else make_mesh(
            data=trainer_config.mesh.data, fsdp=trainer_config.mesh.fsdp
        )

        self.model = build_model(model_config, self.lr_shape, self.hr_shape)
        adam = optax.adam(
            learning_rate=model_config.optimizer.learning_rate,
            b1=model_config.optimizer.betas[0],
            b2=model_config.optimizer.betas[1],
        )
        # Lightning's gradient_clip_val knob (global-norm algorithm, its
        # default); 0 disables — the reference never sets it, so the
        # default reproduces reference behavior exactly.
        clip = float(getattr(trainer_config, "gradient_clip_val", 0.0) or 0.0)
        self.tx = (
            optax.chain(optax.clip_by_global_norm(clip), adam)
            if clip > 0.0
            else adam
        )

        self.scaling_normalizers = scaling_normalizers or [
            Normalizer(
                lr_max=cfg.lr.clamp_max,
                hr_max=cfg.hr.clamp_max if cfg.hr else cfg.lr.clamp_max,
                mode="linear",
            )
        ]

        ckpt_root = trainer_config.checkpoint_root or Path("checkpoints")
        self.ckpt = CheckpointManager(Path(ckpt_root) / model_config.name.value)
        self._eval_cache = {}
        self._tb = None  # lazy TensorBoard event writer (_append_history)
        self._live_state = None

        if getattr(model_config, "s2d_train", False):
            from ..models.rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR
            from ..ops.s2d_forward import make_s2d_train_apply

            if not isinstance(self.model, (GeneratorRRDB_SR, GeneratorRRDB_DN)):
                raise ValueError(
                    "s2d_train=true is supported for the RRDB models only "
                    f"(got {type(self.model).__name__})"
                )
            # already clips in-apply (matching clamped_apply semantics);
            # memory_efficient maps onto per-dense-block jax.checkpoint
            self._apply = make_s2d_train_apply(
                self.model, remat=model_config.memory_efficient
            )
        else:
            self._apply = lambda params, x: clamped_apply(self.model, params, x)
        # fsdp > 1 selects the GSPMD step (params sharded over the fsdp axis
        # via NamedSharding, XLA inserting all-gathers/reduce-scatters — the
        # reference's FSDPStrategy use-case, train.py:142-146); fsdp == 1 is
        # the explicit shard_map DP step.
        self._fsdp = int(self.mesh.shape.get(FSDP_AXIS, 1)) > 1
        # trainer.precision="bf16": bf16 forward/backward, f32 master
        # params/loss/optimizer (steps.py mixed-precision contract). Eval
        # steps always run f32 — metrics are the parity surface.
        self._compute_dtype = (
            jnp.bfloat16
            if getattr(trainer_config, "precision", "f32") == "bf16"
            else None
        )
        # Lightning's accumulate_grad_batches: k loader batches feed one
        # optimizer step via the exact (grads, loss, weight)-sum algebra
        # (steps.py:make_accum_steps); k=1 keeps the fused one-shot steps.
        self._accum = int(
            getattr(trainer_config, "accumulate_grad_batches", 1)
        )
        if self._accum > 1:
            self._grad_step, self._apply_step = make_accum_steps(
                self._apply, self.loss_fn, self.tx,
                mesh=None if self._fsdp else self.mesh,
                compute_dtype=self._compute_dtype,
            )
            self._train_step = None
        elif self._fsdp:
            self._train_step = make_fsdp_train_step(
                self._apply, self.loss_fn, self.tx,
                compute_dtype=self._compute_dtype,
            )
        else:
            self._train_step = make_train_step(
                self._apply, self.loss_fn, self.tx, self.mesh,
                compute_dtype=self._compute_dtype,
            )

        # Optional per-epoch diagnostics hook: callable(epoch, state) ->
        # dict merged into that epoch's history entry (convergence-run
        # instrumentation; None = off).
        self.epoch_callback = None

        # Epoch image logging (reference ImageLogger, rebuilt — see
        # utils/imagelogger.py). Enabled via log_images_every_n_epochs > 0.
        self.image_logger = None
        self._display = None
        if trainer_config.log_images_every_n_epochs > 0:
            from ..data.display import XmmDisplayDataModule
            from ..utils.imagelogger import ImageLogger

            hr_exp = cfg.hr.exp if cfg.hr else cfg.lr.exps[0]
            self.image_logger = ImageLogger(
                out_dir=Path(trainer_config.checkpoint_root or "checkpoints")
                / model_config.name.value
                / "images",
                normalizer=self.dm.normalizer,
                log_every_n_epochs=trainer_config.log_images_every_n_epochs,
                lr_exp_ks=float(cfg.lr.exps[0]),
                hr_exp_ks=float(hr_exp),
            )
            self._display = XmmDisplayDataModule(self.dm)

    # ------------------------------------------------------------------ #

    def init_state(self, seed: int = 0) -> TrainState:
        x = jnp.zeros((1, *self.lr_shape, self.model_config.model.in_channels))
        params = self.model.init(jax.random.PRNGKey(seed), x)
        state = TrainState.create(params, self.tx)
        return self._place_state(state)

    def _place_state(self, state: TrainState) -> TrainState:
        """Device placement policy: replicated (DP) or per-leaf fsdp
        NamedShardings (GSPMD FSDP; optimizer moments follow the same rule
        their parameter leaves do, scalars stay replicated)."""
        if not self._fsdp:
            return replicate(self.mesh, state)
        from jax.sharding import NamedSharding

        from ..parallel.sharding import _is_scan_stacked, fsdp_spec

        fsdp_size = int(self.mesh.shape[FSDP_AXIS])

        def put(path, leaf):
            # scan-stacked leaves (params AND their optimizer moments, which
            # mirror the param tree) never shard the leading group axis —
            # lax.scan slices it per iteration (parallel/sharding.py).
            spec = fsdp_spec(
                np.shape(leaf), fsdp_size,
                exclude_axes=(0,) if _is_scan_stacked(path) else (),
            )
            return jax.device_put(leaf, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map_with_path(put, state)

    def _make_collections(self, prefix: str, extended: bool):
        from ..metrics.collection import CORE_METRIC_NAMES

        names = self.metric_names or CORE_METRIC_NAMES
        core = XMMMetricCollection(
            self.dm.normalizer, self.scaling_normalizers, prefix=prefix,
            metric_names=names,
        )
        in_core = XMMMetricCollection(
            self.dm.normalizer,
            self.scaling_normalizers,
            prefix=prefix,
            metric_names=names,
            input_baseline=True,
        )
        colls = {"metrics": core, "in:metrics": in_core}
        if extended:
            from ..metrics.extended import EXT_METRIC_NAMES

            colls["ext"] = XMMMetricCollection(
                self.dm.normalizer,
                self.scaling_normalizers,
                prefix=prefix,
                metric_names=EXT_METRIC_NAMES,
            )
            colls["in:ext"] = XMMMetricCollection(
                self.dm.normalizer,
                self.scaling_normalizers,
                prefix=prefix,
                metric_names=EXT_METRIC_NAMES,
                input_baseline=True,
            )
        return colls

    def _run_eval(
        self, params, split: str, prefix: str, extended: bool = False,
        include_input_metrics: bool = True,
    ) -> Dict[str, float]:
        # Cache (collections, compiled step) per configuration: the step
        # takes params as an ARGUMENT, so one executable serves every epoch
        # (rebuilding it per epoch would bake the weights in as constants
        # and recompile each time — measured ~80 s/epoch through the
        # remote-AOT tunnel before this cache).
        key = (prefix, extended, include_input_metrics)
        cached = self._eval_cache.get(key)
        if cached is None:
            colls = self._make_collections(prefix, extended)
            if not include_input_metrics:
                colls = {
                    k: v for k, v in colls.items() if not k.startswith("in:")
                }
            updaters = {k: v.update for k, v in colls.items()}
            eval_step = make_eval_step(
                self._apply,
                self.loss_fn,
                self.mesh,
                metric_updaters=updaters,
                upsample_input=self.scale,
            )
            cached = (colls, eval_step)
            self._eval_cache[key] = cached
        colls, eval_step = cached
        states = {k: replicate(self.mesh, v.init()) for k, v in colls.items()}
        loss_sum = jnp.zeros(())
        n = jnp.zeros(())
        for batch in self.dm.loader(split, mesh=self.mesh):
            states, dl, dn = eval_step(params, states, batch)
            loss_sum = loss_sum + dl
            n = n + dn
        if float(n) == 0.0:
            # An empty split must not report loss=0.0 — that would be
            # recorded as a perfect "best" epoch (tiny datasets: the
            # remainder rule can assign a partition zero samples).
            log.warning(
                "%s split produced 0 batches; %s metrics are undefined",
                split, prefix,
            )
            out = {f"{prefix}/loss": float("nan")}
        else:
            out = {f"{prefix}/loss": float(loss_sum / n)}
        for key, coll in colls.items():
            for name, val in coll.compute(states[key]).items():
                out[name] = float(val)
        return out

    # ------------------------------------------------------------------ #

    def fit(self, seed: int = 0, resume: bool = False) -> FitResult:
        state = self.init_state(seed)
        start_epoch = 0
        if resume and self.ckpt.latest_step() is not None:
            state, step = self.ckpt.restore(jax.device_get(state))
            state = self._place_state(state)
            start_epoch = int(step)
            log.info("Resumed from checkpoint at epoch %d", start_epoch)

        epochs = self.trainer_config.epochs
        result = FitResult(best_val_loss=float("inf"), best_step=-1)
        input_metrics_pending = True

        self._live_state = state
        self._host_snapshot = None
        self._host_snapshot_t = 0.0
        try:
            return self._fit_epochs(
                state, start_epoch, epochs, result, input_metrics_pending
            )
        except BaseException as e:
            # Failure handling (SURVEY.md §5.3): every epoch is checkpointed
            # already; on ANY escaping exception (crash, OOM, interrupt) also
            # snapshot the mid-epoch live state so at most one *batch* of
            # progress is lost, then surface how to resume.
            #
            # The live state's buffers are DONATED to the in-flight train
            # step (steps.py donate_argnums), so when the step itself is
            # what crashed (OOM, XlaRuntimeError) device_get hits deleted
            # arrays — fall back to the periodic host-side mirror kept by
            # `_fit_epochs` (staleness bounded by _SNAPSHOT_INTERVAL_S).
            done = start_epoch + len(result.history)
            epath = None
            try:
                if self._live_state is not None:
                    epath = self.ckpt.save_emergency(
                        jax.device_get(self._live_state)
                    )
            except Exception:
                if self._host_snapshot is not None:
                    try:
                        epath = self.ckpt.save_emergency(self._host_snapshot)
                        log.warning(
                            "live state unavailable (buffers donated to the "
                            "failed step) — emergency snapshot is the host "
                            "mirror, up to %.0f s stale",
                            _SNAPSHOT_INTERVAL_S,
                        )
                    except Exception:
                        log.exception("emergency checkpoint failed")
                else:
                    log.exception("emergency checkpoint failed")
            if epath is not None:
                log.warning(
                    "%s at epoch %d — emergency state saved to %s; resume "
                    "with checkpoint_path set (latest stepped save: %s)",
                    type(e).__name__, done, epath, self.ckpt.latest_step(),
                )
            else:
                log.warning(
                    "%s at epoch %d — no emergency snapshot possible; resume "
                    "from the latest stepped save: %s",
                    type(e).__name__, done, self.ckpt.latest_step(),
                )
            raise

    def _fit_epochs(self, state, start_epoch, epochs, result,
                    input_metrics_pending) -> FitResult:
        # early-stopping state (counting restarts on resume — the best
        # checkpoint on disk is the durable part of the decision)
        self._es_best = float("inf")
        self._es_bad_epochs = 0
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            train_losses = []
            acc = None
            n_acc = 0
            for batch in self.dm.loader("train", mesh=self.mesh, epoch=epoch):
                if self._accum > 1:
                    acc = accum_add(
                        acc, self._grad_step(state.params, batch)
                    )
                    n_acc += 1
                    if n_acc < self._accum:
                        continue
                    state, loss = self._apply_step(state, *acc)
                    acc, n_acc = None, 0
                else:
                    state, loss = self._train_step(state, batch)
                self._live_state = state  # crash-snapshot source (fit())
                train_losses.append(loss)
                # Periodic host mirror: the freshest state device_get can
                # still reach after the NEXT step dispatch donates these
                # buffers (fit()'s emergency fallback). Time-based so the
                # sync+transfer cost stays <2% of the step budget.
                now = time.time()
                if now - self._host_snapshot_t >= _SNAPSHOT_INTERVAL_S:
                    self._host_snapshot = jax.device_get(state)
                    self._host_snapshot_t = now
            if acc is not None:
                # tail group shorter than accumulate_grad_batches still
                # steps (Lightning semantics: no gradient is dropped)
                state, loss = self._apply_step(state, *acc)
                self._live_state = state
                train_losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(train_losses))) if train_losses else float("nan")

            val_logs = self._run_eval(
                state.params,
                "val",
                "val",
                include_input_metrics=input_metrics_pending,
            )
            input_metrics_pending = False  # one-shot (model.py:132-142)

            if self.image_logger is not None and self.image_logger.should_log(epoch):
                db = self._display.prepared_batch()
                preds = np.asarray(self._apply(state.params, jnp.asarray(db["lr"])))
                self.image_logger.log_batch(
                    epoch, np.asarray(db["lr"]), preds, db["hr"]
                )
            val_loss = val_logs["val/loss"]

            self.ckpt.save(epoch + 1, jax.device_get(state), val_loss)
            if val_loss < result.best_val_loss:
                result.best_val_loss = val_loss
                result.best_step = epoch + 1

            entry = {"epoch": epoch, "train/loss": train_loss, **val_logs,
                     "time_s": time.time() - t0}
            if self.epoch_callback is not None:
                # diagnostics hook (e.g. grad-norm / param-delta
                # instrumentation, scripts/device_train_convergence.py):
                # whatever dict it returns is merged into the history entry
                extra = self.epoch_callback(epoch, state)
                if extra:
                    entry.update(extra)
            result.history.append(entry)
            self._append_history(entry)
            log.info(
                "epoch %d: train/loss=%.5f val/loss=%.5f (%.1fs)",
                epoch, train_loss, val_loss, entry["time_s"],
            )

            # Lightning's EarlyStopping callback semantics on the val/loss
            # monitor: an epoch "improves" when it beats the best seen by
            # more than min_delta; `patience` non-improving epochs stop the
            # fit (the best checkpoint is already on disk).
            patience = getattr(
                self.trainer_config, "early_stopping_patience", 0
            )
            if patience:
                min_delta = getattr(
                    self.trainer_config, "early_stopping_min_delta", 0.0
                )
                if val_loss < self._es_best - min_delta:
                    self._es_best = val_loss
                    self._es_bad_epochs = 0
                else:
                    self._es_bad_epochs += 1
                    if self._es_bad_epochs >= patience:
                        log.info(
                            "early stopping at epoch %d: val/loss has not "
                            "improved by >%g for %d epoch(s) (best %.5f)",
                            epoch, min_delta, patience, self._es_best,
                        )
                        break
        return result

    def _append_history(self, entry) -> None:
        """JSONL metric log next to the checkpoints (the reference's
        Lightning CSV/W&B scalar channel, model.py:111-151); scalars are
        forwarded to an active W&B run when the package is importable,
        and to a TensorBoard event file (Lightning's DEFAULT logger —
        reference fits always produce `lightning_logs/` event files;
        here: `<checkpoint_root>/tb/`, dependency-free writer)."""
        import json

        clean = {k: (float(v) if hasattr(v, "__float__") else v)
                 for k, v in entry.items()}
        path = self.ckpt.root / "history.jsonl"
        with open(path, "a") as f:
            f.write(json.dumps(clean) + "\n")
        step = int(entry.get("epoch", 0))
        try:
            if self._tb is None:
                from ..utils.tbevents import TBEventWriter

                self._tb = TBEventWriter(self.ckpt.root / "tb")
            self._tb.add_scalars(
                {k: v for k, v in clean.items()
                 if isinstance(v, float) and k != "epoch"},
                step=step,
            )
        except Exception as e:  # observability must never kill a fit
            log.warning("tb event write failed: %s", e)
        try:
            import wandb

            if wandb.run is not None:
                wandb.log(clean, step=step)
        except Exception:
            pass

    def test(
        self,
        state: Optional[TrainState] = None,
        from_best: bool = True,
        extended: bool = True,
        split: str = "test",
    ) -> Dict[str, float]:
        """Evaluate the best (or given) state. `split` allows testing on
        "val" when the test partition is empty (e.g. tiny datasets where
        the torch-random_split remainder rule assigns it zero samples)."""
        if state is None:
            template = jax.device_get(self.init_state())
            state, _ = (
                self.ckpt.restore_best(template)
                if from_best
                else self.ckpt.restore(template)
            )
            state = self._place_state(state)
        return self._run_eval(state.params, split, "test", extended=extended)
