"""Reference-exporter-independent ONNX graph gate (VERDICT r3 missing #1).

The round-3 verify gate ran against a graph exported from the JAX model
itself (`infer/onnx_export.py`), making the graph-level leg self-referential.
These tests close that loop: they instantiate the REFERENCE's own torch
`GeneratorRRDB_SR/_DN` modules (imported from
`/root/reference/xmm_superres_denoise/models/modules/generator_rrdb.py:72-137`
— read-only import, no code copied), seed the state dict, export through
torch's in-process legacy ONNX exporter (no network), and require:

  1. the weight-import + graph-execution gate of `infer/verify.py`
     (`cli.py verify`) is green at <=1e-3 against the torch-produced graph
     on real example data (the BASELINE.md fidelity gate shape), and
  2. the JAX forward agrees with the torch EAGER forward pixel-wise —
     a numerics check fully independent of both ONNX executors.

The stripped production checkpoints share exactly this graph structure
(consumer: reference `utils/run_inference_on_file.py:42-48,155-156`), so a
green run here means dropping in the real blobs exercises no new code path.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF_MODULES = Path("/root/reference/xmm_superres_denoise/models/modules")

pytestmark = pytest.mark.skipif(
    not (REF_MODULES / "generator_rrdb.py").exists(),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def ref_gen():
    """Load the reference generator module without triggering the package
    __init__ (which imports lightning/torchmetrics, absent here)."""
    import importlib.util
    import sys
    import types

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, str(path))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    saved = {k: sys.modules.get(k) for k in ("models", "models.modules")}
    try:
        rb = load("_ref_rrdb_blocks", REF_MODULES / "rrdb_blocks.py")
        fake_models = types.ModuleType("models")
        fake_mm = types.ModuleType("models.modules")
        fake_mm.RRDB, fake_mm.make_layer = rb.RRDB, rb.make_layer
        fake_models.modules = fake_mm
        sys.modules["models"], sys.modules["models.modules"] = (
            fake_models,
            fake_mm,
        )
        yield load("_ref_generator_rrdb", REF_MODULES / "generator_rrdb.py")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _seeded_state(nf: int, nb: int, sr: bool, seed: int):
    """Well-conditioned seeded weights (0.05-scale normal, the
    test_onnx_import convention): kaiming-random untrained weights amplify
    f32 conv-reduction-order noise through the dense trunk to ~7e-3, which
    would gate numerics the real (trained, smooth) checkpoints never see."""
    g = np.random.default_rng(seed)

    def w(o, i):
        return g.normal(0, 0.05, (o, i, 3, 3)).astype(np.float32)

    def b(o):
        return g.normal(0, 0.05, (o,)).astype(np.float32)

    sd = {"conv_first.weight": w(nf, 1), "conv_first.bias": b(nf)}
    for n in range(nb):
        for k in (1, 2, 3):
            for j in range(1, 6):
                sd[f"rrdb.{n}.RDB{k}.conv{j}.weight"] = w(nf, nf + (j - 1) * nf)
                sd[f"rrdb.{n}.RDB{k}.conv{j}.bias"] = b(nf)
    sd["trunk_conv.weight"] = w(nf, nf)
    sd["trunk_conv.bias"] = b(nf)
    if sr:
        sd["upsampling.0.weight"] = w(nf * 4, nf)
        sd["upsampling.0.bias"] = b(nf * 4)
        sd["HRconv.weight"] = w(nf, nf)
        sd["HRconv.bias"] = b(nf)
    sd["conv_last.weight"] = w(1, nf)
    sd["conv_last.bias"] = b(1)
    return sd


def _torch_export(model, x, path):
    """In-process legacy (TorchScript) ONNX export. The final
    `_add_onnxscript_fn` step only reserializes through the `onnx` package
    (not installed) and is an identity when no onnxscript functions exist —
    bypass it for the export, then restore."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, _ops: model_bytes
    try:
        torch.onnx.export(model, x, str(path), dynamo=False, opset_version=11)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return path


def _build_ref(ref_gen, sr: bool, nf: int, nb: int, seed: int):
    cls = ref_gen.GeneratorRRDB_SR if sr else ref_gen.GeneratorRRDB_DN
    kw = {"num_upsample": 1} if sr else {}
    m = cls(in_channels=1, out_channels=1, num_filters=nf, num_res_blocks=nb,
            **kw)
    m.load_state_dict({k: torch.from_numpy(v)
                       for k, v in _seeded_state(nf, nb, sr, seed).items()})
    m.eval()
    return m


@pytest.mark.parametrize("sr", [True, False], ids=["sr", "dn"])
def test_jax_matches_reference_torch_eager(ref_gen, tmp_path, sr):
    """Small-geometry gate: import the torch-produced graph's weights and
    agree with the reference torch EAGER forward (independent numerics)."""
    nf, nb = 8, 2
    m = _build_ref(ref_gen, sr, nf, nb, seed=11 if sr else 12)
    x = torch.from_numpy(
        np.random.default_rng(3).uniform(0, 1, (1, 1, 48, 48)).astype(
            np.float32
        )
    )
    onnx_path = _torch_export(m, torch.zeros_like(x), tmp_path / "ref.onnx")
    with torch.no_grad():
        y_ref = m(x).numpy()

    from xmm_superres_denoise_tpu.infer.onnx_import import import_onnx_params
    from xmm_superres_denoise_tpu.models import (
        GeneratorRRDB_DN,
        GeneratorRRDB_SR,
    )

    jm = (
        GeneratorRRDB_SR(num_filters=nf, num_res_blocks=nb, num_upsample=1)
        if sr
        else GeneratorRRDB_DN(num_filters=nf, num_res_blocks=nb)
    )
    tpl = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    params = {"params": import_onnx_params(onnx_path, tpl["params"])}
    y_jax = np.asarray(
        jnp.clip(
            jm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))),
            0.0,
            1.0,
        )
    ).transpose(0, 3, 1, 2)
    assert y_jax.shape == y_ref.shape
    assert float(np.max(np.abs(y_jax - y_ref))) <= 1e-3

    # and the graph itself executes to the same answer on the lite runtime
    from xmm_superres_denoise_tpu.infer.onnx_runtime_lite import (
        read_onnx_model,
        run_graph,
    )

    g = read_onnx_model(onnx_path)
    y_lite = run_graph(g, {g.inputs[0]: x.numpy()})[g.outputs[0]]
    assert float(np.max(np.abs(y_lite - y_ref))) <= 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("sr", [True, False], ids=["sr", "dn"])
def test_verify_gate_green_on_torch_graph(ref_gen, tmp_path, sr):
    """The full `cli.py verify` gate (production geometry, real example
    data) against a torch-produced reference graph — the BASELINE fidelity
    machinery with zero self-reference to the JAX exporter."""
    from xmm_superres_denoise_tpu.config.schema import (
        DatasetCfg,
        HrDatasetCfg,
        LrDatasetCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
    )
    from xmm_superres_denoise_tpu.infer.verify import (
        default_example_files,
        verify_onnx,
    )

    nf, nb = 32, 4  # production trunk (reference res/configs/models.toml:1-12)
    m = _build_ref(ref_gen, sr, nf, nb, seed=21 if sr else 22)
    onnx_path = _torch_export(
        m, torch.zeros(1, 1, 416, 416), tmp_path / "ref_prod.onnx"
    )

    mask = Path(
        "/root/reference/data/example_data/sim/detector_mask/1x/"
        "pn_mask_500_2000_detxy_1x.ds"
    )
    hr = HrDatasetCfg(
        exp=100 if sr else 50,
        det_mask=None,
        clamp_max=0.0005584 if sr else 0.0022336,
        res=832 if sr else 416,
    )
    cfg = DatasetCfg(
        agn=0, batch_size=1, debug=True, comb_hr=False, crop_mode="center",
        directory=Path("/tmp"), mode="img", name="verify", scaling="sqrt",
        type="real",
        lr=LrDatasetCfg(bkg=0, det_mask=mask, exps=[20],
                        clamp_max=0.0022336, res=416),
        hr=hr,
    )
    mc = ModelCfg(
        name="esr_gen" if sr else "rrdb_denoise", batch_size=1,
        model=RrdbCfg(base_model="esr_gen" if sr else "rrdb_denoise",
                      filters=nf, residual_blocks=nb),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    files = default_example_files(limit=1)
    assert files, "example data missing"
    report = verify_onnx(onnx_path, cfg, mc, files, tol=1e-3, int8=False)
    assert report["pixel_gate_passed"], report
    assert report["passed"], report
    for row in report["files"]:
        assert row["max_abs_diff"] <= 1e-3, row
