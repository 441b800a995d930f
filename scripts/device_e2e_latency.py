"""End-to-end obsid p50 latency on the real chip (the BASELINE.md metric).

Synthesizes a 2M-event EPN observation (PPS dir with event list + FBKTSR),
then measures the full native chain — GTI from rate threshold, filter+bin
to the (411,403) detxy image, 416->832 SR, WCS FITS products — for the
f32 / bf16 / int8 serving modes. Reports per-stage p50 over N runs.

Usage: python scripts/device_e2e_latency.py [n_events] [n_runs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from xmm_superres_denoise_tpu.config.schema import (
    DatasetCfg,
    HrDatasetCfg,
    LrDatasetCfg,
    ModelCfg,
    OptimizerCfg,
    RrdbCfg,
)
from xmm_superres_denoise_tpu.infer.end2end import run_end2end
from xmm_superres_denoise_tpu.infer.run_file import InferenceEngine
from xmm_superres_denoise_tpu.io.fits import write_bintable
from xmm_superres_denoise_tpu.models.registry import build_model

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def make_pps(pps: Path, n: int) -> None:
    g = np.random.default_rng(3)
    x0, x1, y0, y1 = -16120, 16119, -16440, 16439
    write_bintable(
        pps / "P0000000000PNS003PIEVLI0000.FTZ",
        {
            "TIME": np.sort(g.uniform(0, 30_000, n)),
            "DETX": g.integers(x0, x1 + 1, n).astype(np.int32),
            "DETY": g.integers(y0, y1 + 1, n).astype(np.int32),
            "PI": g.integers(150, 12_000, n).astype(np.int32),
            "PATTERN": g.integers(0, 13, n).astype(np.int32),
            "FLAG": np.zeros(n, np.int32),
        },
        extname="EVENTS",
        header={
            "INSTRUME": "EPN", "ONTIME": 30_000.0,
            "CRPIX1": 202.0, "CRPIX2": 206.0, "CRVAL1": 10.0, "CRVAL2": -5.0,
            "CDELT1": -0.001111, "CDELT2": 0.001111, "PA_PNT": 80.0,
            "REFXCDLT": -1.38889e-5, "REFYCDLT": 1.38889e-5,
        },
        column_limits={"DETX": (x0, x1), "DETY": (y0, y1)},
    )
    t = np.arange(0, 30_000, 100.0)
    write_bintable(
        pps / "P0000000000PNS003FBKTSR0000.FTZ",
        {"TIME": t, "RATE": np.full_like(t, 0.2)},
        extname="RATE",
        header={"FLCUTTHR": 0.5},
        primary_header={"INSTRUME": "EPN", "OBS_ID": "0000000000"},
    )
    (pps / "P0000000000OBX000CALIND0000.FTZ").write_bytes(b"\x00")


def measure_relay_overhead(n: int = 11) -> float:
    """p50 of the pure relay cost of one engine-shaped dispatch: one host->
    device transfer, one jitted execution, two device->host readbacks of
    tiny arrays. Everything environment, nothing model — subtracting it
    from the inference stage gives the relay-corrected latency (same
    methodology as the RTT-corrected calibration probes,
    docs/PERFORMANCE.md)."""

    @jax.jit
    def f(x):
        return x + 1.0, x * 2.0

    x = np.zeros((4,), np.float32)
    a, b = f(jnp.asarray(x))
    np.asarray(a), np.asarray(b)  # warm
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        a, b = f(jnp.asarray(x))
        np.asarray(a), np.asarray(b)
        lat.append(time.perf_counter() - t0)
    return float(np.median(lat))


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    work = Path(tempfile.mkdtemp(prefix="xmmsr_e2e_"))
    try:
        pps = work / "pps"
        pps.mkdir()
        make_pps(pps, N_EVENTS)

        relay_s = measure_relay_overhead()
        print(json.dumps({"relay_overhead_p50_s": round(relay_s, 3)}),
              flush=True)

        ds = DatasetCfg(
            directory=Path("."), scaling="sqrt", type="boring",
            lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=416),
            hr=HrDatasetCfg(exp=100, clamp_max=0.0005584, res=832),
        )
        mc = ModelCfg(
            name="esr_gen", memory_efficient=False, batch_size=1,
            model=RrdbCfg(base_model="esr_gen", filters=32,
                          residual_blocks=4),
            optimizer=OptimizerCfg(learning_rate=1e-4),
        )
        model = build_model(mc, (416, 416), (832, 832))
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 1))
        )

        for mode, kw in [
            ("f32", {}),
            ("bf16", {"dtype": jnp.bfloat16}),
            ("int8", {"quantize": True}),
        ]:
            engine = InferenceEngine(mc, ds, params, **kw)
            lat = []
            for i in range(N_RUNS + 1):
                out = work / f"out_{mode}_{i}"
                r = run_end2end(
                    pps, engine, out, hr_exp_ks=100.0,
                    model_name="esr_gen", plot=False,
                )
                if i:  # first run = compile warmup
                    lat.append(r["latency_s"])
                shutil.rmtree(out, ignore_errors=True)
            p50 = {
                k: round(float(np.median([d[k] for d in lat])), 3)
                for k in lat[0]
            }
            # relay-corrected: the warm engine's inference stage minus the
            # pure relay dispatch/readback cost (environment, not framework)
            p50["inference_relay_corrected"] = round(
                max(p50["inference"] - relay_s, 0.0), 3
            )
            p50["total_relay_corrected"] = round(
                max(p50["total"] - relay_s, 0.0), 3
            )
            print(json.dumps({"mode": mode, "p50_s": p50}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
