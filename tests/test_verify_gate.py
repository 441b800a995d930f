"""One-command real-weights parity gate (cli verify / infer/verify.py).

Runs the gate green against a locally-exported ONNX stand-in (the real
HuggingFace checkpoints are not importable in this environment): weight
import -> pixel-wise <= 1e-3 vs the independent lite runtime on real
example images -> PSNR/SSIM parity -> int8 recalibration gate.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmm_superres_denoise_tpu.config import (
    DatasetCfg,
    HrDatasetCfg,
    LrDatasetCfg,
    ModelCfg,
    OptimizerCfg,
    RrdbCfg,
)
from xmm_superres_denoise_tpu.infer.onnx_export import export_rrdb_onnx_model
from xmm_superres_denoise_tpu.infer.verify import (
    default_example_files,
    verify_onnx,
)
from xmm_superres_denoise_tpu.models.registry import build_model

REF_MASK = Path("/root/reference/res/detector_mask/pn_mask_500_2000_detxy_1x.ds")


def _cfgs(sr=True):
    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(
            bkg=0, exps=[20], clamp_max=0.0022336, res=416,
            det_mask=REF_MASK if REF_MASK.exists() else None,
        ),
        hr=HrDatasetCfg(
            exp=100 if sr else 50,
            clamp_max=0.0005584 if sr else 0.0022336,
            res=832 if sr else 416,
        ),
        scaling="sqrt",
        type="boring",
    )
    name = "esr_gen" if sr else "rrdb_denoise"
    mc = ModelCfg(
        name=name, memory_efficient=False, batch_size=1,
        model=RrdbCfg(base_model=name, filters=8, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    return ds, mc


@pytest.mark.skipif(
    not default_example_files(limit=1), reason="example data not present"
)
def test_verify_gate_green_on_local_export(tmp_path):
    ds, mc = _cfgs(sr=True)
    model = build_model(mc, (416, 416), (832, 832))
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 416, 416, 1)))
    onnx = export_rrdb_onnx_model(model, params, tmp_path / "sr.onnx")

    report = verify_onnx(
        onnx, ds, mc, default_example_files(limit=2), tol=1e-3, int8=True
    )
    assert report["passed"], report
    assert report["pixel_gate_passed"]
    assert report["runtime"] in ("onnxruntime", "lite")
    assert len(report["files"]) == 2
    for row in report["files"]:
        assert row["max_abs_diff"] <= 1e-3
        assert row["psnr_vs_onnx"] > 40.0
        assert row["ssim_vs_onnx"] > 0.99
    assert report["int8_psnr_db"] >= 40.0
    assert report["int8_gate_passed"]


@pytest.mark.skipif(
    not default_example_files(limit=1), reason="example data not present"
)
def test_verify_gate_detects_mismatch(tmp_path, monkeypatch):
    """A broken import mapping (simulated by perturbing one imported
    weight) must fail the pixel gate rather than silently pass."""
    ds, mc = _cfgs(sr=True)
    model = build_model(mc, (416, 416), (832, 832))
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 416, 416, 1)))
    onnx = export_rrdb_onnx_model(model, params, tmp_path / "sr.onnx")

    import xmm_superres_denoise_tpu.infer.onnx_import as oi

    real = oi.import_onnx_params

    def corrupted(path, template, **kw):
        out = real(path, template, **kw)
        leaf = jax.tree_util.tree_leaves(out)[0]
        leaf = np.asarray(leaf).copy()
        leaf.flat[0] += 0.05
        leaves = jax.tree_util.tree_leaves(out)
        leaves[0] = leaf
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(out), leaves
        )

    monkeypatch.setattr(oi, "import_onnx_params", corrupted)
    report = verify_onnx(
        onnx, ds, mc, default_example_files(limit=1), tol=1e-3, int8=False
    )
    assert not report["pixel_gate_passed"]
    assert not report["passed"]


def test_cli_verify_wiring(tmp_path, monkeypatch, capsys):
    """cli verify parses args, calls the gate, exits 0/1 on pass/fail."""
    from xmm_superres_denoise_tpu import cli

    calls = {}

    def fake_verify(onnx, ds, mc, files, tol, int8):
        calls.update(onnx=onnx, n=len(files), tol=tol, int8=int8)
        return {"passed": True, "pixel_gate_passed": True, "files": []}

    monkeypatch.setattr(
        "xmm_superres_denoise_tpu.infer.verify.verify_onnx", fake_verify
    )
    onnx = tmp_path / "m.onnx"
    onnx.write_bytes(b"")
    data = tmp_path / "data"
    data.mkdir()
    (data / "a.fits").write_bytes(b"")
    rc = cli.main([
        "verify", "--onnx", str(onnx),
        "--run_config", "res/configs/runs/esr_gen_sr.toml",
        "--data", str(data), "--tol", "5e-4",
    ])
    assert rc == 0
    assert calls["onnx"] == onnx and calls["n"] == 1
    assert calls["tol"] == 5e-4 and calls["int8"] is True
