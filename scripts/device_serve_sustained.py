"""Sustained serving-path throughput: the FULL `cli serve` pipeline
(VERDICT r4 #6).

bench.py times pure device forwards; production serving adds host FITS
decode, preprocess, device<->host transfer, denormalize, and product
FITS writes. This script drives `infer.run_file.serve_files` — the exact
function `cli.py serve` dispatches to — over a directory of replicated
real example FITS (each file one production 416^2 tile) and reports
sustained tiles/s + utilization vs the pure-device bench rate, warm
engine (compile excluded, as in a long-lived serving daemon).

Usage: python scripts/device_serve_sustained.py [n_files] [batch] [pipeline]
  pipeline: int8 (default) | bf16 | f32
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

EXAMPLE = Path("/root/reference/data/example_data/real/20ks")
DEVICE_RATE = {  # pure device-side bench.py numbers for utilization context
    "int8": 148.5,  # int8-b128 (docs/PERFORMANCE.md)
    "bf16": 75.0,  # s2d bf16 b32
    "f32": None,  # filled by the f32 bench candidates when measured
}

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
PIPELINE = sys.argv[3] if len(sys.argv) > 3 else "int8"


def main() -> None:
    from xmm_superres_denoise_tpu.utils.jitcache import apply_cache_config

    apply_cache_config()

    import jax
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.config.schema import (
        DatasetCfg,
        HrDatasetCfg,
        LrDatasetCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
    )
    from xmm_superres_denoise_tpu.infer.run_file import (
        InferenceEngine,
        serve_files,
    )
    from xmm_superres_denoise_tpu.io.fits import read_image
    from xmm_superres_denoise_tpu.models.registry import build_model

    print("devices:", jax.devices(), flush=True)

    src = sorted(EXAMPLE.glob("*.fits*"))
    if not src:
        raise SystemExit(f"no example FITS under {EXAMPLE}")

    work = Path(tempfile.mkdtemp(prefix="xmmsr_serve_"))
    try:
        in_dir = work / "in"
        out_dir = work / "out"
        in_dir.mkdir()
        out_dir.mkdir()
        # replicate the real files round-robin (distinct names; symlinks —
        # decode cost is identical, the bytes are re-read per file)
        files = []
        for i in range(N_FILES):
            s = src[i % len(src)]
            suffix = "".join(s.suffixes)
            dst = in_dir / f"tile_{i:04d}{suffix}"
            dst.symlink_to(s)
            files.append(dst)

        mask, _ = read_image(
            Path(
                "/root/reference/data/example_data/sim/detector_mask/1x/"
                "pn_mask_500_2000_detxy_1x.ds"
            )
        )
        ds = DatasetCfg(
            directory=Path("."),
            lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=416),
            hr=HrDatasetCfg(exp=100, clamp_max=0.0005584, res=832),
            scaling="sqrt",
            type="boring",
        )
        mc = ModelCfg(
            name="esr_gen", memory_efficient=False, batch_size=BATCH,
            model=RrdbCfg(base_model="esr_gen", filters=32,
                          residual_blocks=4),
            optimizer=OptimizerCfg(learning_rate=1e-4),
        )
        model = build_model(mc, (416, 416), (832, 832))
        # trained weights when the convergence artifact exists (throughput
        # is weight-independent; this just keeps products meaningful)
        npz = REPO / "docs" / "convergence_esr_gen" / "best_params.npz"
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 416, 416, 1)))
        if npz.exists():
            from xmm_superres_denoise_tpu.train.checkpoints import (
                load_params_npz,
            )

            params = load_params_npz(npz, params)

        eng = InferenceEngine(
            mc, ds, params, det_mask=np.asarray(mask, np.float32),
            dtype=jnp.bfloat16 if PIPELINE == "bf16" else jnp.float32,
            quantize=(PIPELINE == "int8"),
        )

        # Warm pass: compile + first-touch on a small slice (a serving
        # daemon pays this once at startup).
        t0 = time.perf_counter()
        serve_files(files[: 2 * BATCH], eng, out_dir, hr_exp_ks=100.0,
                    model_name="esr_gen", batch_size=BATCH)
        warm_s = time.perf_counter() - t0
        shutil.rmtree(out_dir)
        out_dir.mkdir()

        t0 = time.perf_counter()
        serve_files(files, eng, out_dir, hr_exp_ks=100.0,
                    model_name="esr_gen", batch_size=BATCH)
        dt = time.perf_counter() - t0
        n_products = len(list(out_dir.glob("*predict*")))
        rate = N_FILES / dt
        device_rate = DEVICE_RATE.get(PIPELINE)
        util = rate / device_rate if device_rate else None
        result = {
            "pipeline": PIPELINE,
            "batch": BATCH,
            "n_files": N_FILES,
            "warm_pass_s": round(warm_s, 2),
            "sustained_s": round(dt, 2),
            "sustained_tiles_per_sec": round(rate, 2),
            "device_rate_tiles_per_sec": device_rate,
            "utilization_vs_device_rate": round(util, 3) if util else None,
            "products_written": n_products,
        }
        print(json.dumps(result, indent=2), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
