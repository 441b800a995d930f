"""One-command real-weights parity gate (BASELINE.md fidelity rows).

The reference's production artifacts are two ONNX checkpoints consumed at
`/root/reference/xmm_superres_denoise/utils/run_inference_on_file.py:42-48,155-156`
(weights on HuggingFace; blobs stripped from this checkout). This module is
the one-file-drop gate the project runs the moment such a checkpoint is
available:

    python -m xmm_superres_denoise_tpu.cli verify --onnx XMM-SuperRes.onnx \
        --run_config res/configs/runs/esr_gen_prod.toml

For every example-data image it checks, in BASELINE-gate terms:

  1. weight import: ONNX initializers -> Flax pytree (onnx_import);
  2. output fidelity: JAX forward vs the ONNX graph executed by an
     independent runtime (onnxruntime when installed, else the in-tree
     lite runtime) — pixel-wise max|diff| <= tol (default 1e-3);
  3. quality parity: PSNR/SSIM between the two outputs (the BASELINE
     "PSNR/SSIM parity" row, reported per file);
  4. int8 serving fidelity: recalibrated w8a8 path vs the f32 forward
     (`quantization_psnr`, gate >= 40 dB — the real-data golden-gate
     threshold of tests/test_int8_forward.py).

Until the real checkpoints are importable the gate runs green against a
locally-exported stand-in (tests/test_verify_gate.py), proving the
machinery end to end.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import DatasetCfg, ModelCfg
from ..data.datasets import load_det_mask
from ..io.fits import read_image
from ..metrics.functional import psnr as psnr_fn, ssim as ssim_fn
from ..models.registry import build_model
from ..ops.preprocess import pad_to_res
from ..ops.stretch import Normalizer

log = logging.getLogger("xmmsr")

INT8_GATE_DB = 40.0  # real-data golden-gate threshold


def _onnx_forward(onnx_path: Path):
    """Independent ONNX executor: onnxruntime if importable, else the
    in-tree lite runtime. Returns fn(NCHW f32) -> NCHW f32."""
    try:
        import onnxruntime as ort

        sess = ort.InferenceSession(
            str(onnx_path), providers=["CPUExecutionProvider"]
        )
        iname = sess.get_inputs()[0].name

        def run(x):
            return sess.run(None, {iname: x})[0]

        return run, "onnxruntime"
    except ImportError:
        from .onnx_runtime_lite import read_onnx_model, run_graph

        graph = read_onnx_model(onnx_path)

        def run(x):
            return run_graph(graph, {graph.inputs[0]: x})[graph.outputs[0]]

        return run, "lite"


def verify_onnx(
    onnx_path: Path,
    dataset_config: DatasetCfg,
    model_config: ModelCfg,
    data_files: List[Path],
    tol: float = 1e-3,
    int8: bool = True,
) -> Dict[str, object]:
    """Run the full gate; returns the report dict (["passed"] overall)."""
    if not data_files:
        # a gate with zero images would be vacuously green — refuse
        raise ValueError(
            "verify_onnx: data_files is empty — nothing to verify against"
        )
    cfg = dataset_config
    lr_res = cfg.lr.res
    hr_res = cfg.hr.res if cfg.hr else cfg.lr.res
    model = build_model(model_config, (lr_res, lr_res), (hr_res, hr_res))
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, lr_res, lr_res, 1)))

    from .onnx_import import import_onnx_params

    params = {"params": import_onnx_params(onnx_path, template["params"])}
    onnx_run, runtime = _onnx_forward(onnx_path)
    log.info("verify: ONNX weights imported; reference runtime = %s", runtime)

    nz = Normalizer(
        lr_max=cfg.lr.clamp_max,
        hr_max=cfg.hr.clamp_max if cfg.hr else cfg.lr.clamp_max,
        mode=cfg.scaling,
    )
    mask = load_det_mask(cfg.lr.det_mask) if cfg.lr.det_mask else None

    # the gate is f32-vs-f32: trace under matmul precision "float32" so the
    # TPU doesn't bf16-truncate the convs and fail the tolerance that the
    # same program clears on CPU (ops/precision.py)
    from ..ops.precision import true_f32

    @jax.jit
    @true_f32
    def jax_forward(x):
        return jnp.clip(model.apply(params, x), 0.0, 1.0)

    rows = []
    calib_input = None
    for f in data_files:
        # the exact serve-path counts->rate conversion (EXPOSURE/ONTIME
        # fallback included): the gate must validate the same input
        # distribution production serves
        from .run_file import load_rate_image

        rate, hdr, exposure = load_rate_image(f)
        x = rate
        if mask is not None:
            x = x * mask.astype(np.float32)
        x = np.asarray(pad_to_res(jnp.asarray(x[None]), lr_res))
        x = np.asarray(nz.normalize_lr(jnp.asarray(x[..., None])), np.float32)
        if calib_input is None:
            calib_input = x

        y_jax = np.asarray(jax_forward(jnp.asarray(x)), np.float64)
        y_onnx = (
            onnx_run(x.transpose(0, 3, 1, 2).astype(np.float32))
            .transpose(0, 2, 3, 1)
            .astype(np.float64)
        )
        maxdiff = float(np.max(np.abs(y_jax - y_onnx)))
        rows.append({
            "file": f.name,
            "max_abs_diff": maxdiff,
            "pixel_gate": bool(maxdiff <= tol),
            "psnr_vs_onnx": round(float(psnr_fn(jnp.asarray(y_jax),
                                                jnp.asarray(y_onnx))), 2),
            "ssim_vs_onnx": round(float(ssim_fn(jnp.asarray(y_jax, jnp.float32),
                                                jnp.asarray(y_onnx, jnp.float32))), 5),
        })
        log.info("verify: %s max|diff|=%.2e psnr=%.1f", f.name, maxdiff,
                 rows[-1]["psnr_vs_onnx"])

    report: Dict[str, object] = {
        "onnx": str(onnx_path),
        "runtime": runtime,
        "tol": tol,
        "files": rows,
        "pixel_gate_passed": all(r["pixel_gate"] for r in rows),
    }

    if int8:
        from ..models.rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR

        if isinstance(model, (GeneratorRRDB_SR, GeneratorRRDB_DN)):
            from ..ops.int8_forward import quantization_psnr

            db = quantization_psnr(model, params, jnp.asarray(calib_input))
            report["int8_psnr_db"] = round(float(db), 2)
            report["int8_gate_passed"] = bool(db >= INT8_GATE_DB)
        else:
            report["int8_gate_passed"] = None  # transformers: no int8 path

    report["passed"] = bool(
        report["pixel_gate_passed"]
        and report.get("int8_gate_passed", True) is not False
    )
    return report


def default_example_files(limit: Optional[int] = None) -> List[Path]:
    """The real 20 ks example images — the production input distribution
    (`data/example_data`, BASELINE.md fidelity row)."""
    root = Path("/root/reference/data/example_data/real/20ks")
    files = sorted(root.glob("*.fits*"))
    return files[:limit] if limit else files
