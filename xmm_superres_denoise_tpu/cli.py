"""Command-line interface: train / test / infer / detxy.

Rebuilds the reference entry points (`/root/reference/xmm_superres_denoise/
train.py:19-171`, `inference_end2end_obsid.py`,
`produce_detxy_image_for_inference.py`) on the JAX harness:

  python -m xmm_superres_denoise_tpu.cli fit   <run_config.toml>
  python -m xmm_superres_denoise_tpu.cli test  <run_config.toml>
  python -m xmm_superres_denoise_tpu.cli infer --fits F --ckpt C --run_config R
  python -m xmm_superres_denoise_tpu.cli detxy --pps DIR --out DIR

Config assembly matches train.py: run-config TOML selects dataset/model/
trainer; model hparams come from res/configs/models.toml (optimizer fields
split out, train.py:35-44); loss weights + per-stretch scaling tables from
res/configs/loss_functions.toml gated by `use_scaling` (train.py:46-53).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import tomllib
from pathlib import Path

# Persistent XLA compilation cache: production-size compiles cost minutes
# through the remote AOT service but ~1 s once cached (docs/PERFORMANCE.md).
# One shared authority (also used by bench.py and __graft_entry__.py)
# covers both the before-jax-import (env var) and pre-imported-jax
# (config route) cases; utils/__init__ is lazy so this pulls no jax.
from .utils.jitcache import apply_cache_config

apply_cache_config()

RES_DIR = Path(__file__).resolve().parents[1] / "res"

log = logging.getLogger("xmmsr")


def load_run_config(path: Path, res_dir: Path = RES_DIR):
    """TOML -> (DatasetCfg, ModelCfg, TrainerCfg, loss sc_dict, LossCfg)."""
    from .config.schema import DatasetCfg, ModelCfg, TrainerCfg
    from .train.loss import load_scaling_tables

    with open(path, "rb") as f:
        cfg = tomllib.load(f)

    dataset = cfg["dataset"]
    if dataset.get("hr", {}).get("exp") == 0:
        dataset["hr"] = None
    dataset_config = DatasetCfg(**dataset)

    model_dict = dict(cfg["model"])
    with open(res_dir / "configs" / "models.toml", "rb") as f:
        registry = tomllib.load(f)
    model_dict["model"] = dict(registry[model_dict["name"]])
    # only pass keys the registry entry actually sets — missing ones fall
    # back to the OptimizerCfg schema defaults (a bare .pop raised KeyError
    # with no pointer to models.toml)
    model_dict["optimizer"] = {
        k: v
        for k, v in (
            ("learning_rate", model_dict["model"].pop("learning_rate", None)),
            ("betas", model_dict["model"].pop("betas", None)),
        )
        if v is not None
    }
    model_dict["batch_size"] = dataset_config.batch_size
    model_config = ModelCfg(**model_dict)

    with open(res_dir / "configs" / "loss_functions.toml", "rb") as f:
        loss_toml = tomllib.load(f)
    sc_dict, loss_config = load_scaling_tables(loss_toml, dataset_config.scaling)

    trainer_config = TrainerCfg(**cfg.get("trainer", {}))
    if trainer_config.mesh.remat and not model_config.memory_efficient:
        # mesh.remat == the reference's activation-checkpointing strategy
        # knob (train.py:142-146): force the model's remat path on.
        model_config = model_config.model_copy(
            update={"memory_efficient": True}
        )
    return dataset_config, model_config, trainer_config, sc_dict, loss_config


def _build_trainer(args):
    from .data.datamodule import XmmDataModule
    from .ops.stretch import Normalizer
    from .train.loop import Trainer
    from .train.loss import create_loss

    ds_cfg, m_cfg, t_cfg, sc_dict, l_cfg = load_run_config(args.run_config)
    dm = XmmDataModule(ds_cfg, seed=t_cfg.seed, boring_size=ds_cfg.boring_size)
    loss = create_loss(sc_dict, l_cfg)
    scaling_normalizers = [
        Normalizer(
            lr_max=ds_cfg.lr.clamp_max,
            hr_max=ds_cfg.hr.clamp_max if ds_cfg.hr else ds_cfg.lr.clamp_max,
            mode="linear",
        )
    ]
    return Trainer(m_cfg, t_cfg, dm, loss, scaling_normalizers), t_cfg


def _snapshot_run_config(trainer, run_config: Path) -> None:
    """Reproducibility: copy the run config next to the checkpoints so a
    checkpoint directory always records exactly which TOML produced it
    (the reference has no equivalent; Lightning only does this for models
    opting into save_hyperparameters)."""
    import shutil

    dst = trainer.ckpt.root / "run_config.toml"
    try:
        src_bytes = Path(run_config).read_bytes()
        if dst.exists() and dst.read_bytes() != src_bytes:
            # resumes with an EDITED config keep both: the original stays,
            # the latest goes to a numbered sidecar — but a resume with an
            # ALREADY-RECORDED edit must not mint a duplicate copy
            n = 1
            while True:
                sidecar = trainer.ckpt.root / f"run_config.{n}.toml"
                if not sidecar.exists():
                    break
                if sidecar.read_bytes() == src_bytes:
                    return  # this exact config is already on record
                n += 1
            dst = sidecar
        if not dst.exists():
            shutil.copyfile(run_config, dst)
    except OSError as e:  # snapshotting must never block a fit
        log.warning("run-config snapshot failed: %s", e)


def cmd_fit(args) -> int:
    trainer, t_cfg = _build_trainer(args)
    _snapshot_run_config(trainer, args.run_config)
    import contextlib

    profile_dir = getattr(args, "profile", None)
    if profile_dir is not None:
        # jax.profiler trace around the whole fit (open with TensorBoard /
        # xprof; device timelines + the step annotations from utils.profiling)
        from .utils.profiling import trace

        ctx = trace(Path(profile_dir))
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        result = trainer.fit(
            seed=t_cfg.seed, resume=t_cfg.checkpoint_path is not None
        )
    log.info(
        "fit done: best val/loss %.5f at epoch %d",
        result.best_val_loss, result.best_step,
    )
    logs = trainer.test(extended=not args.no_extended)
    _print_logs_json(logs)
    return 0


def _print_logs_json(logs) -> None:
    """Strict JSON for tooling consumers: undefined metrics (e.g. an empty
    test split) serialize as null, not the non-standard NaN token."""
    import math

    clean = {
        k: (None if isinstance(v, float) and not math.isfinite(v) else v)
        for k, v in logs.items()
    }
    print(json.dumps(clean, indent=2))


def cmd_test(args) -> int:
    trainer, _ = _build_trainer(args)
    logs = trainer.test(extended=not args.no_extended)
    _print_logs_json(logs)
    return 0


def _build_engine(args):
    """Shared engine construction for the `infer` and `serve` subcommands:
    run config -> model -> checkpoint params (npz/onnx/orbax) -> optional
    fingerprint-bound int8 scales -> InferenceEngine.

    Returns (engine, ds_cfg, m_cfg, save_scales) where `save_scales()`
    persists freshly calibrated int8 scales (bound to the checkpoint
    fingerprint) if an --int8_scales path was given and no valid scales
    were loaded."""
    import jax
    import jax.numpy as jnp

    from .data.datasets import load_det_mask
    from .infer.run_file import InferenceEngine
    from .models.registry import build_model
    from .train.checkpoints import load_params_npz

    ds_cfg, m_cfg, _, _, _ = load_run_config(args.run_config)
    lr = (ds_cfg.lr.res, ds_cfg.lr.res)
    hr = (ds_cfg.hr.res, ds_cfg.hr.res) if ds_cfg.hr else lr
    model = build_model(m_cfg, lr, hr)

    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *lr, 1)))
    ckpt = Path(args.checkpoint)
    if ckpt.suffix == ".npz":
        params = load_params_npz(ckpt, template)
    elif ckpt.suffix == ".onnx":
        from .infer.onnx_import import import_onnx_params

        params = {"params": import_onnx_params(ckpt, template["params"])}
    else:
        from .train.checkpoints import CheckpointManager
        from .train.steps import TrainState

        import optax

        mngr = CheckpointManager(ckpt)
        state, _ = mngr.restore_best(
            TrainState.create(template, optax.adam(1e-4))
        )
        params = state.params

    mask = load_det_mask(ds_cfg.lr.det_mask) if ds_cfg.lr.det_mask else None
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    scales = None
    scales_path = getattr(args, "int8_scales", None)
    if args.int8 and scales_path and Path(scales_path).exists():
        from .utils.fingerprint import params_fingerprint

        obj = json.loads(Path(scales_path).read_text())
        if isinstance(obj, dict) and "scales" in obj:
            fp = params_fingerprint(params)
            if obj.get("fingerprint") == fp:
                scales = obj["scales"]
            else:
                log.warning(
                    "int8 scales %s were calibrated for a DIFFERENT "
                    "checkpoint (fingerprint mismatch) — ignoring them and "
                    "recalibrating from the first batch.",
                    scales_path,
                )
        else:  # legacy un-fingerprinted flat dict
            log.warning(
                "int8 scales %s carry no checkpoint fingerprint (legacy "
                "format); using as-is. Re-save to bind them to this "
                "checkpoint.",
                scales_path,
            )
            scales = obj
    # --mesh_data N: shard serving batches over an N-device data mesh
    # (ICI batch parallelism; docs/SERVING.md "Multi-chip"). 0 = single
    # device, -1 = all local devices.
    mesh = None
    n_mesh = int(getattr(args, "mesh_data", 0) or 0)
    if n_mesh == -1 or n_mesh > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(data="auto" if n_mesh == -1 else n_mesh)
        log.info("serving mesh: %s", dict(mesh.shape))
    engine = InferenceEngine(
        m_cfg, ds_cfg, params, det_mask=mask, dtype=dtype,
        crop_p=getattr(args, "crop_p", 1.0), quantize=args.int8,
        int8_scales=scales, mesh=mesh,
    )

    def save_scales() -> None:
        if args.int8 and scales_path and scales is None and engine.int8_scales:
            from .utils.fingerprint import params_fingerprint

            Path(scales_path).write_text(json.dumps({
                "fingerprint": params_fingerprint(params),
                "scales": engine.int8_scales,
            }))

    return engine, ds_cfg, m_cfg, save_scales


def cmd_infer(args) -> int:
    from .infer.run_file import infer_file

    engine, ds_cfg, m_cfg, save_scales = _build_engine(args)
    p_in, p_pred = infer_file(
        Path(args.fits), engine, Path(args.out),
        hr_exp_ks=float(ds_cfg.hr.exp if ds_cfg.hr else ds_cfg.lr.exps[0]),
        model_name=m_cfg.name.value,
        plot=args.plot,
    )
    save_scales()
    print(json.dumps({"input": str(p_in), "prediction": str(p_pred)}))
    return 0


def cmd_serve(args) -> int:
    """Batched production serving: a set of detxy FITS files through ONE
    warm engine (pipelined predict_tiles) -> per-file product pairs.
    With --watch, the positional args are directories polled as a daemon
    (watch_and_serve): new stable files are served as they appear."""
    import glob as _glob

    from .infer.run_file import serve_files

    if args.watch:
        import threading

        from .infer.run_file import watch_and_serve

        dirs = [Path(p) for p in args.fits]
        missing = [str(d) for d in dirs if not d.is_dir()]
        if missing:
            log.error("serve --watch: not directories: %s", missing)
            return 2
        engine, ds_cfg, m_cfg, save_scales = _build_engine(args)
        stop = threading.Event()
        prev = _install_stop_signals(stop)
        log.info("serve --watch: polling %s every %.1fs (SIGTERM stops)",
                 [str(d) for d in dirs], args.poll)
        try:
            n = watch_and_serve(
                dirs, engine, Path(args.out),
                hr_exp_ks=float(
                    ds_cfg.hr.exp if ds_cfg.hr else ds_cfg.lr.exps[0]
                ),
                model_name=m_cfg.name.value,
                batch_size=args.batch,
                poll_s=args.poll,
                state_path=args.state,
                stop=stop,
                max_polls=args.max_polls,
                plot=args.plot,
            )
        finally:  # in-process callers (tests, notebooks) keep their handlers
            _restore_stop_signals(prev)
        save_scales()
        print(json.dumps({"served": n}))
        return 0

    files: list = []
    unmatched: list = []
    for pat in args.fits:
        hits = sorted(_glob.glob(str(pat)))
        if hits:
            files.extend(hits)
        elif Path(pat).exists():  # literal path containing glob metachars
            files.append(pat)
        else:
            unmatched.append(str(pat))
    if unmatched or not files:
        log.error("serve: no input files matched %s", unmatched or args.fits)
        return 2
    files = list(dict.fromkeys(files))  # overlapping patterns: serve once
    engine, ds_cfg, m_cfg, save_scales = _build_engine(args)
    results = serve_files(
        files, engine, Path(args.out),
        hr_exp_ks=float(ds_cfg.hr.exp if ds_cfg.hr else ds_cfg.lr.exps[0]),
        model_name=m_cfg.name.value,
        batch_size=args.batch,
        plot=args.plot,
    )
    save_scales()
    print(json.dumps([
        {"file": str(f), "input": str(p[0]), "prediction": str(p[1])}
        for f, p in zip(files, results)
    ]))
    return 0


def cmd_http(args) -> int:
    """HTTP inference service: POST detxy FITS -> WCS product bytes from
    ONE warm engine (infer/http_server.py). SIGTERM/SIGINT stop cleanly."""
    import threading

    from .infer.http_server import run_http_server

    engine, ds_cfg, m_cfg, save_scales = _build_engine(args)
    stop = threading.Event()
    prev = _install_stop_signals(stop)
    try:
        server = run_http_server(
            args.host, args.port, engine,
            hr_exp_ks=float(ds_cfg.hr.exp if ds_cfg.hr else ds_cfg.lr.exps[0]),
            model_name=m_cfg.name.value,
            stop=stop,
        )
    finally:
        _restore_stop_signals(prev)
    save_scales()
    print(json.dumps({"served": server.stats()}))
    return 0


def _install_stop_signals(stop):
    """SIGTERM/SIGINT -> stop.set(); returns previous handlers to restore.

    Signal handlers only work on the main thread — embedded callers
    (tests, notebooks driving `main()` in a worker thread) get a no-op
    and control the daemon via the stop event instead of crashing."""
    import signal as _signal

    prev = {}
    for s in (_signal.SIGTERM, _signal.SIGINT):
        try:
            prev[s] = _signal.signal(s, lambda *_: stop.set())
        except ValueError:  # not the main thread
            pass
    return prev


def _restore_stop_signals(prev) -> None:
    import signal as _signal

    for s, h in prev.items():
        try:
            _signal.signal(s, h)
        except ValueError:
            pass


def cmd_end2end(args) -> int:
    """obsid PPS dir -> detxy -> SR/DN products (reference
    inference_end2end_obsid.py equivalent)."""
    from .infer.end2end import run_end2end

    # the same construction path as `infer`/`serve` — a private rebuild here
    # had already drifted (no fingerprint-bound int8 scale persistence)
    engine, ds_cfg, m_cfg, save_scales = _build_engine(args)
    result = run_end2end(
        Path(args.pps), engine, Path(args.out),
        hr_exp_ks=float(ds_cfg.hr.exp if ds_cfg.hr else ds_cfg.lr.exps[0]),
        model_name=m_cfg.name.value,
        instrument=args.instrument,
        max_expo_ks=args.max_expo,
        plot=args.plot,
        use_sas=args.use_sas,
    )
    save_scales()
    print(json.dumps({k: str(v) for k, v in result.items()}))
    return 0


def cmd_export(args) -> int:
    """Export trained weights to the deployment formats (ONNX initializers
    with torch naming / flat npz) — the role of the reference's shipped
    XMM-SuperRes.onnx / XMM-DeNoise.onnx checkpoints."""
    import jax
    import jax.numpy as jnp
    import optax

    from .models.registry import build_model
    from .train.checkpoints import CheckpointManager, save_params_npz
    from .train.steps import TrainState

    ds_cfg, m_cfg, _, _, _ = load_run_config(args.run_config)
    lr = (ds_cfg.lr.res, ds_cfg.lr.res)
    hr = (ds_cfg.hr.res, ds_cfg.hr.res) if ds_cfg.hr else lr
    model = build_model(m_cfg, lr, hr)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *lr, 1)))
    state, step = CheckpointManager(Path(args.checkpoint)).restore_best(
        TrainState.create(template, optax.adam(1e-4))
    )
    out = Path(args.out)
    if out.suffix == ".onnx":
        from .models.rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR

        if isinstance(model, (GeneratorRRDB_SR, GeneratorRRDB_DN)):
            # Full runnable graph (nodes + torch-named weights) — the
            # reference's deployment artifact format.
            from .infer.onnx_export import export_rrdb_onnx_model

            export_rrdb_onnx_model(model, state.params, out)
        else:
            # Transformers: torch-named weight initializers (importable by
            # import_onnx_params; graph emission is RRDB-only for now).
            from .infer.onnx_import import export_onnx_params

            export_onnx_params(state.params, out)
    else:
        save_params_npz(out, state.params)
    print(json.dumps({"exported": str(out), "from_step": int(step)}))
    return 0


def cmd_verify(args) -> int:
    """One-command real-weights parity gate (BASELINE.md fidelity rows):
    ONNX import -> pixel-wise <= tol vs an independent ONNX runtime on the
    example data -> PSNR/SSIM parity table -> int8 recalibration gate.
    Exit code 0 iff every gate passes (infer/verify.py)."""
    from .infer.verify import default_example_files, verify_onnx

    ds_cfg, m_cfg, _, _, _ = load_run_config(args.run_config)
    if args.data is not None:
        files = sorted(Path(args.data).glob("*.fits*"))
    else:
        files = default_example_files(limit=args.limit)
    if not files:
        print(json.dumps({"error": "no input FITS files found"}))
        return 2
    report = verify_onnx(
        Path(args.onnx), ds_cfg, m_cfg, files,
        tol=args.tol, int8=not args.no_int8,
    )
    print(json.dumps(report, indent=2))
    return 0 if report["passed"] else 1


def cmd_detxy(args) -> int:
    from .infer.end2end import detxy_for_obsid

    out = detxy_for_obsid(
        Path(args.pps), Path(args.out), instrument=args.instrument,
        max_expo_ks=args.max_expo, use_sas=args.use_sas,
    )
    print(json.dumps({"detxy": str(out)}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    """The full CLI surface (testable without dispatch)."""
    parser = argparse.ArgumentParser(prog="xmmsr")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ("fit", "test"):
        p = sub.add_parser(name, help=f"{name} a model from a run config")
        p.add_argument("run_config", type=Path)
        p.add_argument("--no-extended", action="store_true")
        if name == "fit":
            p.add_argument(
                "--profile", type=Path, default=None,
                help="capture a jax.profiler trace of the whole fit into "
                     "this directory (open with TensorBoard/xprof)",
            )
        p.set_defaults(func=cmd_fit if name == "fit" else cmd_test)

    p = sub.add_parser("infer", help="run SR/DN inference on a detxy FITS")
    p.add_argument("--fits", type=Path, required=True)
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--run_config", type=Path, required=True)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving mode (f32 is the parity mode)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 quantized serving (RRDB models; MXU int8 "
                        "mode, ~1.8x bf16 batched; scales calibrated on "
                        "the input)")
    p.add_argument("--int8_scales", type=Path, default=None,
                   help="calibrated-scales JSON: loaded if it exists, "
                        "written after first-batch calibration otherwise")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="shard serving batches over an N-device data mesh "
                        "(multi-chip batch parallelism; -1 = all local "
                        "devices, 0/1 = single device)")
    p.add_argument("--crop_p", type=float, default=1.0,
                   help="crop fraction applied after padding, origin per the "
                        "dataset crop_mode (1.0 = no crop, reference default)")
    p.set_defaults(func=cmd_infer)

    p = sub.add_parser(
        "serve",
        help="batched production serving: many detxy FITS through one "
             "warm engine (pipelined tile batching)",
    )
    p.add_argument("fits", nargs="+",
                   help="detxy FITS paths or glob patterns")
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--run_config", type=Path, required=True)
    p.add_argument("--batch", type=int, default=32,
                   help="device batch size (32 = measured throughput "
                        "sweet spot, docs/SERVING.md)")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving mode (f32 is the parity mode)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 quantized serving (RRDB models)")
    p.add_argument("--int8_scales", type=Path, default=None,
                   help="calibrated-scales JSON: loaded if it exists, "
                        "written after first-batch calibration otherwise")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="shard serving batches over an N-device data mesh "
                        "(multi-chip batch parallelism; -1 = all local "
                        "devices, 0/1 = single device)")
    p.add_argument("--watch", action="store_true",
                   help="daemon mode: treat the positional args as "
                        "directories and serve new stable FITS files as "
                        "they appear (SIGTERM stops cleanly)")
    p.add_argument("--poll", type=float, default=2.0,
                   help="watch poll interval seconds")
    p.add_argument("--state", type=Path, default=None,
                   help="watch served-set JSON: restartable daemons skip "
                        "already-served files")
    p.add_argument("--max_polls", type=int, default=None,
                   help="watch drain mode: exit after N polls instead of "
                        "running forever (e.g. 2 = one stability check + "
                        "one serve pass; for cron-style batch drains)")
    p.set_defaults(func=cmd_serve)

    p = sub.add_parser(
        "http",
        help="HTTP inference service: POST a detxy FITS to /infer, get the "
             "WCS product back (GET /healthz, /stats)",
    )
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (0.0.0.0 to expose)")
    p.add_argument("--port", type=int, default=8572,
                   help="TCP port (0 picks a free one)")
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--run_config", type=Path, required=True)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving mode (f32 is the parity mode)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 quantized serving (RRDB models)")
    p.add_argument("--int8_scales", type=Path, default=None,
                   help="calibrated-scales JSON: loaded if it exists, "
                        "written after first-batch calibration otherwise")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="shard serving batches over an N-device data mesh "
                        "(multi-chip batch parallelism; -1 = all local "
                        "devices, 0/1 = single device)")
    p.set_defaults(func=cmd_http)

    p = sub.add_parser("export", help="export best checkpoint to onnx/npz")
    p.add_argument("--checkpoint", type=Path, required=True,
                   help="checkpoint directory (orbax manager root)")
    p.add_argument("--out", type=Path, required=True, help=".onnx or .npz path")
    p.add_argument("--run_config", type=Path, required=True)
    p.set_defaults(func=cmd_export)

    p = sub.add_parser(
        "end2end", help="obsid PPS dir -> detxy -> SR/DN FITS products"
    )
    p.add_argument("--pps", type=Path, required=True)
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--run_config", type=Path, required=True)
    p.add_argument("--instrument", default="pn")
    p.add_argument("--max_expo", type=float, default=20.0)
    p.add_argument("--use_sas", action="store_true")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving mode (f32 is the parity mode)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 quantized serving (RRDB models)")
    p.add_argument("--int8_scales", type=Path, default=None,
                   help="persist/load fingerprint-bound int8 scales JSON")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="shard serving batches over an N-device data mesh "
                        "(multi-chip batch parallelism; -1 = all local "
                        "devices, 0/1 = single device)")
    p.set_defaults(func=cmd_end2end)

    p = sub.add_parser(
        "verify",
        help="real-weights parity gate: ONNX vs JAX on example data "
             "(pixel <= tol, PSNR/SSIM table, int8 fidelity)",
    )
    p.add_argument("--onnx", type=Path, required=True,
                   help="ONNX checkpoint (e.g. XMM-SuperRes.onnx)")
    p.add_argument("--run_config", type=Path, required=True)
    p.add_argument("--data", type=Path, default=None,
                   help="FITS directory (default: example real 20ks set)")
    p.add_argument("--tol", type=float, default=1e-3,
                   help="pixel-wise gate tolerance (BASELINE.md: 1e-3)")
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of files")
    p.add_argument("--no_int8", action="store_true",
                   help="skip the int8 recalibration fidelity gate")
    p.set_defaults(func=cmd_verify)

    p = sub.add_parser("detxy", help="event list -> detxy image (native or SAS)")
    p.add_argument("--pps", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--instrument", default="pn")
    p.add_argument("--max_expo", type=float, default=20.0)
    p.add_argument("--use_sas", action="store_true")
    p.set_defaults(func=cmd_detxy)
    return parser


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
