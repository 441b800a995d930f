"""Single-file inference: detxy FITS -> model -> SR/DN FITS (+ PNG plots).

The TPU-native rebuild of the reference's inference utility
(`/root/reference/xmm_superres_denoise/utils/run_inference_on_file.py:51-200`),
with its documented bitrot repaired (SURVEY.md §2.4): clean config plumbing,
a fused jitted preprocess+forward+denormalize pipeline, checkpoints from the
orbax/npz store (filling the role of .ckpt/.onnx dispatch), and WCS-carrying
FITS products.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import DatasetCfg, ModelCfg
from ..io.fits import read_header, read_image
from ..io.wcs import write_xmm_product_wcs
from ..models.registry import build_model
from ..ops.preprocess import pad_to_res
from ..ops.stretch import Normalizer

log = logging.getLogger("xmmsr")

EXPOSURE_WINDOW_KS = (15.0, 25.0)  # training regime sanity band


class InferenceEngine:
    """A jit-compiled detxy-image -> prediction pipeline.

    The whole mask -> pad -> normalize -> model -> clamp -> denormalize chain
    is ONE jitted function (`run_inference_on_file.py:137-170` squeezed into
    a single device program); weights stay resident between calls.
    """

    def __init__(
        self,
        model_config: ModelCfg,
        dataset_config: DatasetCfg,
        params,
        det_mask: Optional[np.ndarray] = None,
        dtype=jnp.float32,
        crop_p: float = 1.0,
        quantize: bool = False,
        int8_scales: Optional[dict] = None,
        mesh=None,
    ):
        """`dtype=jnp.bfloat16` runs the model body in bf16 (params cast once;
        normalization/denormalization stay f32 for product fidelity) — the
        serving configuration. f32 (default) is the parity configuration:
        it traces at matmul precision "float32" (TRUE f32 even on TPU,
        where the default precision would multiply in bf16 —
        ops/precision.py; measured classes in docs/fidelity_classes.json).

        `quantize=True` serves the RRDB models through the statically
        calibrated w8a8 space-to-depth path (`ops/int8_forward.py`, ~1.8x
        bf16 batched on the v5e MXU's int8 mode). Activation scales are
        calibrated lazily from the FIRST batch passed to the engine — or
        supplied via `int8_scales` (a `calibrate_int8_scales` dict, e.g.
        loaded from a JSON saved next to the checkpoint) to skip
        calibration. After first use the scales are available as
        `self.int8_scales` for persistence. Fidelity is a measured quantity
        (`ops.int8_forward.quantization_psnr`).

        `crop_p` < 1 crops the padded input to that fraction before
        normalization, origin per `dataset_config.crop_mode` — the reference
        applies `Crop(crop_p=1.0, mode=crop_mode)` at this exact point
        (run_inference_on_file.py:144-152), so 1.0 (identity) is the
        production default.

        `mesh`: a `jax.sharding.Mesh` with a `data` axis — batches are
        placed with `NamedSharding(mesh, P("data"))` so serving scales
        linearly over chips (batch size should be a multiple of the axis
        size; docs/SERVING.md)."""
        cfg = dataset_config
        self.lr_res = cfg.lr.res
        self.hr_res = cfg.hr.res if cfg.hr else cfg.lr.res
        self.normalizer = Normalizer(
            lr_max=cfg.lr.clamp_max,
            hr_max=cfg.hr.clamp_max if cfg.hr else cfg.lr.clamp_max,
            mode=cfg.scaling,
        )
        self.model = build_model(
            model_config, (self.lr_res, self.lr_res), (self.hr_res, self.hr_res)
        )
        self._quantize = bool(quantize)
        self.int8_scales = int8_scales
        self._f32_params = params  # pre-cast copy for weight quantization
        if quantize:
            from ..models.rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR

            if not isinstance(self.model, (GeneratorRRDB_SR, GeneratorRRDB_DN)):
                raise ValueError(
                    "quantize=True is supported for the RRDB models only "
                    f"(got {type(self.model).__name__})"
                )
        if dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                params,
            )
        self.params = params
        mask = None
        if det_mask is not None:
            mask = jnp.asarray(det_mask, jnp.float32)
        nz = self.normalizer
        model = self.model
        lr_res = self.lr_res

        if not 0.0 < crop_p <= 1.0:
            raise ValueError(f"crop_p must be in (0, 1], got {crop_p}")
        crop_args = None
        if crop_p < 1.0:
            from ..ops.preprocess import crop_fractions

            crop_args = (crop_p, *crop_fractions(cfg.crop_mode, crop_p))

        def _prep(raw):  # raw: (B, H, W) native geometry, f32
            x = raw
            if mask is not None:
                x = x * mask
            x = pad_to_res(x, lr_res)
            if crop_args is not None:
                from ..ops.preprocess import crop

                x = crop(x, *crop_args)
            x = x[..., None]  # NHWC
            return nz.normalize_lr(x)

        def _make_run(apply_fn):
            @jax.jit
            def _run(params, raw):
                x = _prep(raw)
                pred = apply_fn(params, x).astype(jnp.float32)
                pred = jnp.clip(pred, 0.0, 1.0)
                return (
                    nz.denormalize_hr(pred)[..., 0],
                    nz.denormalize_lr(x)[..., 0],
                )

            return _run

        def _make_run_pred(apply_fn):
            # Predictions-only variant for the chunked throughput path:
            # skips computing + device->host transferring the denormalized
            # input that predict_tiles discards.
            @jax.jit
            def _runp(params, raw):
                x = _prep(raw)
                pred = apply_fn(params, x).astype(jnp.float32)
                return nz.denormalize_hr(jnp.clip(pred, 0.0, 1.0))[..., 0]

            return _runp

        self._prep = jax.jit(_prep)
        self._make_run = _make_run
        self._make_run_pred = _make_run_pred
        self._dtype = dtype
        self._mesh = mesh
        if quantize:
            # built lazily: first batch calibrates scales
            self._run = None
            self._run_pred = None
        else:
            apply_fn = lambda p, x: model.apply(p, x.astype(dtype))
            if dtype == jnp.float32:
                # the parity configuration must be TRUE f32 on the serving
                # hardware: TPU default-precision convs multiply in bf16
                # (measured 6.6e-3 off the 1e-3 parity bar on trained
                # weights — ops/precision.py)
                from ..ops.precision import true_f32

                apply_fn = true_f32(apply_fn)
            self._run = _make_run(apply_fn)
            self._run_pred = _make_run_pred(apply_fn)

    def _ensure_built(self, raw: jnp.ndarray) -> None:
        """Quantized path: calibrate activation scales from this batch (or
        the supplied scales) and build the jitted runners once."""
        if self._run is not None:
            return
        from ..ops.int8_forward import (
            calibrate_int8_scales,
            make_int8_s2d_forward,
        )

        if self.int8_scales is None:
            self.int8_scales = calibrate_int8_scales(
                self.model, self._f32_params, self._prep(raw)
            )
        fwd8 = make_int8_s2d_forward(
            self.model, self._f32_params, dtype=self._dtype,
            scales=self.int8_scales,
        )
        self._run = self._make_run(lambda p, x: fwd8(x))
        self._run_pred = self._make_run_pred(lambda p, x: fwd8(x))

    def _place(self, raw: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
        """Mesh placement with divisibility padding: pads B to a multiple of
        the data-axis size (repeating the last tile) so any batch serves on
        any mesh; callers trim outputs back to the returned valid count."""
        b = raw.shape[0]
        if self._mesh is None or b == 1:
            return raw, b
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = int(self._mesh.shape["data"])
        pad = (-b) % axis
        if pad:
            raw = jnp.concatenate(
                [raw, jnp.repeat(raw[-1:], pad, axis=0)], axis=0
            )
        return jax.device_put(raw, NamedSharding(self._mesh, P("data"))), b

    def __call__(self, raw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """raw (H, W) or (B, H, W) -> (prediction, denormalized padded input)."""
        single = raw.ndim == 2
        if single:
            raw = raw[None]
        raw = jnp.asarray(raw, jnp.float32)
        self._ensure_built(raw)
        raw, valid = self._place(raw)
        pred, inp = self._run(self.params, raw)
        pred, inp = np.asarray(pred)[:valid], np.asarray(inp)[:valid]
        return (pred[0], inp[0]) if single else (pred, inp)

    # Pipeline chunks through JAX's async dispatch: keep up to _INFLIGHT
    # device programs queued ahead of the host readback so chunk i+1's
    # upload+compute overlaps chunk i's device->host transfer instead of
    # serializing on np.asarray (~110 MB HBM per in-flight chunk:
    # 32 x (416^2 in + 832^2 out) fp32).
    _INFLIGHT = 2

    def _tiles_pipeline(self, raw, batch_size, runner, n_out):
        """Chunked serving with graceful OOM degradation.

        Runs `_tiles_pipeline_once` at `batch_size`; if the device
        exhausts memory (the serve path holds readback buffers bench.py's
        pure device chain never pays for, so its knee is lower —
        docs/SERVING.md), the batch is halved and the pipeline restarted
        from scratch until a size fits (floor 1). The working cap is
        remembered on the engine so later calls (`serve_files` sub-batches,
        the watch daemon) start there instead of re-discovering it."""
        bs = min(batch_size, getattr(self, "_serve_batch_cap", batch_size))
        while True:
            try:
                out = self._tiles_pipeline_once(raw, bs, runner, n_out)
                if bs < batch_size:
                    self._serve_batch_cap = bs
                return out
            except Exception as e:
                if "RESOURCE_EXHAUSTED" not in repr(e):
                    raise
                if bs <= 1:
                    # Measured on a 16 GB v5e: the SERVE path (pipelined
                    # chunks + full-res output readback) exhausts memory
                    # at int8 b64/b128 even though bench.py's device-side
                    # chain runs b128; the serve knee is b32
                    # (docs/SERVING.md). Reaching b1 means even a single
                    # tile does not fit — nothing left to degrade.
                    raise RuntimeError(
                        "device out of memory serving even batch_size=1 "
                        f"with {self._INFLIGHT + 1} chunks in flight"
                    ) from e
                failed = bs
                bs = max(1, bs // 2)
                log.warning(
                    "serve: device out of memory at batch %d; retrying at "
                    "%d (measured serve regime on a 16 GB chip: 32)",
                    failed, bs,
                )

    def _tiles_pipeline_once(self, raw, batch_size, runner, n_out):
        """Shared chunk/pad/pipeline loop behind `predict_tiles` and
        `run_tiles`: splits (N, ...) into `batch_size` chunks, pads the
        tail chunk by repeating its last tile so every device program has
        the same shape (ONE compilation), trims afterwards. Returns a
        tuple of `n_out` concatenated host arrays."""
        n = raw.shape[0]
        outs = tuple([] for _ in range(n_out))
        pending: list = []  # (device result(s), valid_count)

        def _drain(limit: int) -> None:
            while len(pending) > limit:
                res, k = pending.pop(0)
                if n_out == 1:
                    res = (res,)
                for lst, dev in zip(outs, res):
                    lst.append(np.asarray(dev)[:k])

        for i in range(0, n, batch_size):
            chunk = raw[i : i + batch_size]
            k = chunk.shape[0]
            if k < batch_size:  # pad to the compiled shape, trim after
                pad = np.repeat(chunk[-1:], batch_size - k, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            chunk = jnp.asarray(chunk, jnp.float32)
            self._ensure_built(chunk)
            chunk, _ = self._place(chunk)
            pending.append((runner(self.params, chunk), k))
            _drain(self._INFLIGHT)
        _drain(0)
        return tuple(np.concatenate(lst, axis=0) for lst in outs)

    def predict_tiles(
        self, raw: np.ndarray, batch_size: int = 32
    ) -> np.ndarray:
        """Chunked batched serving: (N, H, W) -> (N, H', W') predictions.

        `batch_size` chunks are the measured throughput sweet spot
        (docs/SERVING.md). Runs the predictions-only jit: the denormalized
        input `__call__` also returns is never computed or transferred."""
        return self._tiles_pipeline(
            raw, batch_size, lambda p, x: self._run_pred(p, x), 1
        )[0]

    def run_tiles(
        self, raw: np.ndarray, batch_size: int = 32
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Chunked batched serving returning BOTH halves of `__call__`'s
        output: (N, H, W) -> (predictions, denormalized padded inputs).

        Same chunking/padding/pipelining as `predict_tiles` but through the
        two-output `_run` program, so the mask/pad/normalize chain runs
        ONCE per tile and feeds both the model and the input product
        (batch product writing, `serve_files`)."""
        return self._tiles_pipeline(
            raw, batch_size, lambda p, x: self._run(p, x), 2
        )


def load_rate_image(fits_file: Path) -> Tuple[np.ndarray, dict, float]:
    """detxy FITS -> (rate image counts/s, header, exposure seconds) with the
    training-regime exposure sanity warning (run_inference_on_file.py:126-135)."""
    img, hdr = read_image(fits_file)
    exposure = float(hdr.get("EXPOSURE", hdr.get("ONTIME", 0.0)))
    ontime_ks = exposure / 1000.0
    lo, hi = EXPOSURE_WINDOW_KS
    if ontime_ks <= lo or ontime_ks >= hi:
        log.warning(
            "The networks were trained on 20 ks exposure images; "
            "the exposure time of the input image is %.2f ks.",
            ontime_ks,
        )
    else:
        log.info("Input exposure: %.2f ks", ontime_ks)

    # rate image (counts / exposure) like the training data normalization
    rate = img.astype(np.float32)
    if exposure > 0:
        rate = rate / exposure
    return rate, hdr, exposure


def infer_file(
    fits_file: Path,
    engine: InferenceEngine,
    out_path: Path,
    hr_exp_ks: float,
    model_name: str,
    plot: bool = True,
) -> Tuple[Path, Path]:
    """detxy FITS -> {input, prediction} WCS FITS products
    (_infer_file semantics, run_inference_on_file.py:101-200)."""
    fits_file = Path(fits_file)
    if not fits_file.exists():
        raise FileNotFoundError(f"File {fits_file} not found!")
    out_path = Path(out_path)
    out_path.mkdir(parents=True, exist_ok=True)

    rate, hdr, exposure = load_rate_image(fits_file)
    pred, inp = engine(rate)
    return write_products(
        inp, pred, out_path, fits_file, exposure, hr_exp_ks, model_name,
        hdr, plot=plot,
    )


def serve_files(
    files,
    engine: InferenceEngine,
    out_path: Path,
    hr_exp_ks: float,
    model_name: str,
    batch_size: int = 32,
    plot: bool = False,
):
    """Batched production serving: many detxy FITS -> product pairs.

    The throughput counterpart of `infer_file`: all inputs are read
    host-side, stacked by native geometry, and run through the engine's
    pipelined `run_tiles` (one compiled two-output program per shape
    group, up to two chunks in flight, one preprocess pass feeding both
    the model and the input product) instead of one engine call per
    file; `write_products` emits per-file outputs identical to the
    single-file path.

    Memory is bounded: inputs are re-read per sub-batch (a few chunks at a
    time) and products are written before the next sub-batch runs, so a
    10k-file batch never holds 10k images or predictions on the host.

    Returns [(input_product, prediction_product), ...] aligned with
    `files`."""
    files = [Path(f) for f in files]

    # Distinct product stems even when inputs from different directories
    # share a basename (obsA/img.fits + obsB/img.fits must not clobber
    # each other's products in the single --out directory).
    bases = [f.stem.replace(".fits", "") for f in files]
    seen: dict = {}
    stems: list = []
    for b in bases:
        k = seen.get(b, 0)
        seen[b] = k + 1
        stems.append(b if k == 0 else f"{b}__{k + 1}")

    # pass 1: geometry only — header-only reads (no data decode), group by
    # native shape, O(1) held at once
    groups: dict = {}
    for idx, f in enumerate(files):
        hdr = read_header(f)
        shape = tuple(
            int(hdr[f"NAXIS{i}"]) for i in range(int(hdr["NAXIS"]), 0, -1)
        )
        groups.setdefault(shape, []).append(idx)

    results: list = [None] * len(files)
    sub_cap = batch_size * 4  # a few pipelined chunks per resident stack
    # Product writes (WCS header build + gzip + disk) overlap the NEXT
    # sub-batch's device work through a small writer pool: sustained-serve
    # profiling showed the loop host-bound on exactly this serial tail
    # (docs/SERVING.md "Sustained serving throughput"). Outstanding writes
    # are drained each sub-batch, so peak host memory stays one sub-batch
    # of products (the same bound the serial loop had).
    from concurrent.futures import ThreadPoolExecutor

    # matplotlib (the optional plot path) is not thread-safe — keep plots
    # on a single writer thread; the overlap with device work remains.
    with ThreadPoolExecutor(max_workers=1 if plot else 4) as pool:
        pending: list = []
        for idxs in groups.values():
            for s in range(0, len(idxs), sub_cap):
                sub = idxs[s : s + sub_cap]
                metas = [load_rate_image(files[i]) for i in sub]
                stack = np.stack([m[0] for m in metas])
                preds, inps = engine.run_tiles(stack, batch_size=batch_size)
                for i, fut in pending:  # previous sub-batch's writes
                    results[i] = fut.result()
                pending = [
                    (
                        i,
                        pool.submit(
                            write_products,
                            inps[j], preds[j], out_path, files[i],
                            metas[j][2], hr_exp_ks, model_name, metas[j][1],
                            plot=plot, out_stem=stems[i],
                        ),
                    )
                    for j, i in enumerate(sub)
                ]
        for i, fut in pending:
            results[i] = fut.result()
    return results


def watch_and_serve(
    watch_dirs,
    engine: InferenceEngine,
    out_path: Path,
    hr_exp_ks: float,
    model_name: str,
    batch_size: int = 32,
    poll_s: float = 2.0,
    pattern: str = "*.fits*",
    state_path: Optional[Path] = None,
    stop=None,
    max_polls: Optional[int] = None,
    plot: bool = False,
) -> int:
    """Directory-watching serving daemon over ONE warm engine.

    The long-running counterpart of `serve_files` (production mode: a
    pipeline drops detxy FITS files into a directory; products appear in
    `out_path`). Semantics:

    * A file is picked up only once its (size, mtime) is UNCHANGED between
      two consecutive polls — a writer mid-copy is left for the next poll.
    * Work identity is (path, size, mtime): an overwritten input is served
      again; a re-poll of an already-served file is not.
    * `state_path` persists the served-set as JSON so a restarted daemon
      does not reprocess history (atomic replace per batch).
    * A batch failure falls back to per-file serving so one corrupt input
      cannot wedge the queue; the bad file is recorded as failed (served
      state) and skipped thereafter, matching `serve_files`' contract that
      good inputs always produce products.
    * `stop` (a threading.Event) ends the loop at the next poll boundary;
      `max_polls` bounds it for tests. Returns the number of files served.
    """
    import threading

    watch_dirs = [Path(d) for d in (
        watch_dirs if isinstance(watch_dirs, (list, tuple)) else [watch_dirs]
    )]
    stop = stop or threading.Event()

    served: dict = {}
    if state_path is not None and Path(state_path).exists():
        try:
            served = json.loads(Path(state_path).read_text())
        except (OSError, ValueError) as e:
            log.warning("watch: unreadable state %s (%s); starting fresh",
                        state_path, e)

    def _key(p: Path, st) -> str:
        return f"{p}|{st.st_size}|{st.st_mtime_ns}"

    def _persist() -> None:
        if state_path is None:
            return
        tmp = Path(str(state_path) + ".tmp")
        tmp.write_text(json.dumps(served))
        tmp.replace(state_path)

    n_served = 0
    pending: dict = {}  # path -> (size, mtime_ns) seen last poll
    polls = 0
    while not stop.is_set() and (max_polls is None or polls < max_polls):
        polls += 1
        snapshot: dict = {}
        live_keys: set = set()
        for d in watch_dirs:
            for f in sorted(d.glob(pattern)):
                try:
                    st = f.stat()
                except OSError:
                    continue  # vanished between glob and stat
                k = _key(f, st)
                live_keys.add(k)
                if k in served:
                    continue
                snapshot[f] = (st.st_size, st.st_mtime_ns, k)

        # Prune served entries for file versions that can never match
        # again (deleted or overwritten inputs): without this, a
        # months-long daemon over a rotating directory grows its state
        # monotonically — one dead key per file version ever seen.
        stale = [k for k in served if k not in live_keys]
        if stale:
            for k in stale:
                del served[k]
            _persist()

        ready = [
            f for f, (size, mt, _) in snapshot.items()
            if pending.get(f) == (size, mt)
        ]
        if ready:
            try:
                serve_files(
                    ready, engine, out_path, hr_exp_ks, model_name,
                    batch_size=batch_size, plot=plot,
                )
                for f in ready:
                    served[snapshot[f][2]] = "ok"
                n_served += len(ready)
            except Exception as batch_err:  # isolate the bad input
                log.warning("watch: batch failed (%s); serving per-file",
                            batch_err)
                for f in ready:
                    try:
                        # batch_size=1: a corrupt input is isolated AND a
                        # misconfigured batch (device OOM pads one file to
                        # `batch_size` tiles) degrades to working
                        # single-tile programs instead of marking every
                        # file permanently failed.
                        serve_files(
                            [f], engine, out_path, hr_exp_ks, model_name,
                            batch_size=1, plot=plot,
                        )
                        served[snapshot[f][2]] = "ok"
                        n_served += 1
                    except Exception as e:
                        log.error("watch: %s failed permanently: %s", f, e)
                        served[snapshot[f][2]] = f"error: {e}"
            _persist()

        pending = {f: (size, mt) for f, (size, mt, _) in snapshot.items()}
        if stop.is_set() or (max_polls is not None and polls >= max_polls):
            break
        stop.wait(poll_s)
    return n_served


def write_products(
    inp: np.ndarray,
    pred: np.ndarray,
    out_path: Path,
    fits_file: Path,
    exposure: float,
    hr_exp_ks: float,
    model_name: str,
    hdr: dict,
    plot: bool = True,
    out_stem: Optional[str] = None,
) -> Tuple[Path, Path]:
    """Write the {input, prediction} WCS FITS product pair (+ optional PNG
    plots) for one source file (`run_inference_on_file.py:169-199`). Shared
    by single-file `infer_file` and the batched `cli.py serve` path so both
    emit identical products. `out_stem` overrides the product stem (the
    batched path disambiguates colliding basenames with it)."""
    stem = out_stem or fits_file.stem.replace(".fits", "")
    # both names built from the stem — replace("input","predict") on the
    # full name mangled stems that themselves contain "input"/"predict"
    # and could collide two different files' products
    in_name = f"{stem}_input_wcs"
    pred_name = f"{stem}_predict_wcs"
    res_mult = pred.shape[0] // inp.shape[0]

    p_in = write_xmm_product_wcs(
        inp, out_path, fits_file.name, 1, exposure,
        comment="Input image padded and WCS aligned. Needs to be multiplied by exposure.",
        out_file_name=in_name, in_header=hdr,
    )
    p_pred = write_xmm_product_wcs(
        pred, out_path, fits_file.name, res_mult, hr_exp_ks * 1000.0,
        comment=(
            f"XMM {model_name} model prediction. Needs to be multiplied by "
            "exposure. It's possible that the given exposure is not correctly "
            "calculated so take care."
        ),
        out_file_name=pred_name, in_header=hdr,
    )

    if plot:
        # single-file path keeps the reference's fixed plot names
        # (run_inference_on_file.py:89,98); the batched path prefixes with
        # the (collision-free) product stem so plots don't clobber.
        _save_plots(p_in, p_pred, out_path,
                    prefix=f"{out_stem}_" if out_stem else "")
    return p_in, p_pred


def _save_plots(p_in: Path, p_pred: Path, out: Path, prefix: str = "") -> None:
    """99.5-percentile plasma plots (run_inference_on_file.py:75-98)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for path, name in (
        (p_in, f"{prefix}plot_in.png"), (p_pred, f"{prefix}plot_out.png")
    ):
        img, _ = read_image(path)
        finite = img[np.isfinite(img)]
        lo, hi = np.percentile(finite, [0.25, 99.75])
        plt.figure()
        plt.imshow(
            np.clip(img, lo, hi), cmap="plasma", origin="lower",
            interpolation="nearest",
        )
        plt.savefig(out / name)
        plt.close()
