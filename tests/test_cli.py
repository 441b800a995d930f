"""CLI end-to-end smoke: config assembly + tiny boring-dataset fit/test."""

import json
from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.cli import load_run_config

ROOT = Path(__file__).resolve().parents[1]


def _write_run_config(tmp_path, epochs=1):
    cfg = f"""
[trainer]
accelerator = "auto"
strategy = "auto"
checkpoint_path = ""
checkpoint_root = "{tmp_path / 'ckpts'}"
devices = "auto"
epochs = {epochs}
log_images_every_n_epochs = 1
seed = 0

[trainer.mesh]
data = "auto"
fsdp = 1

[dataset]
agn = 0
batch_size = 8
check_files = false
crop_mode = "center"
debug = true
comb_hr = false
directory = "{tmp_path}"
mode = "img"
name = "boring_cli"
scaling = "sqrt"
type = "boring"

[dataset.lr]
bkg = 0
det_mask = ""
exps = [20]
clamp_max = 0.0022336
res = 32

[dataset.hr]
agn = true
exp = 100
det_mask = ""
clamp_max = 0.0005584
res = 64

[model]
name = "esr_gen"
memory_efficient = false
"""
    p = tmp_path / "run.toml"
    p.write_text(cfg)
    return p


def test_load_run_config(tmp_path):
    p = _write_run_config(tmp_path)
    ds, m, t, sc, loss = load_run_config(p, res_dir=ROOT / "res")
    assert ds.type.value == "boring"
    assert m.name.value == "esr_gen"
    assert m.model.filters == 32  # from the registry
    assert m.optimizer.learning_rate == 1e-4
    assert t.epochs == 1
    # sqrt scaling tables selected
    assert sc is not None and "psnr" in sc
    assert loss.psnr == 0.5 and loss.ms_ssim == 0.5


def test_cli_fit_smoke(tmp_path, monkeypatch):
    """Tiny full fit through the real Trainer (small model override)."""
    from xmm_superres_denoise_tpu.config import (
        LossCfg,
        MeshCfg,
        ModelCfg,
        OptimizerCfg,
        RrdbCfg,
        TrainerCfg,
    )
    from xmm_superres_denoise_tpu.data import XmmDataModule
    from xmm_superres_denoise_tpu.train import Trainer, create_loss

    run = _write_run_config(tmp_path)
    ds_cfg, _, t_cfg, _, _ = load_run_config(run, res_dir=ROOT / "res")
    dm = XmmDataModule(ds_cfg, splits_root=tmp_path / "splits", boring_size=24)
    mc = ModelCfg(
        name="esr_gen",
        memory_efficient=False,
        batch_size=8,
        model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    trainer = Trainer(
        mc, t_cfg, dm, create_loss(None, LossCfg(l1=1.0)),
        metric_names=["psnr", "l1"],
    )
    result = trainer.fit()
    assert len(result.history) == 1
    # image logger produced a panel (log_images_every_n_epochs = 1)
    panels = list((Path(t_cfg.checkpoint_root) / "esr_gen" / "images").rglob("*.png"))
    assert panels, "expected display panels from the image logger"


@pytest.mark.slow
def test_cli_end2end_with_onnx_checkpoint(tmp_path):
    """Full CLI chain: synthetic PPS dir + ONNX weights -> products."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xmm_superres_denoise_tpu.cli import main
    from xmm_superres_denoise_tpu.infer.onnx_import import export_onnx_params
    from xmm_superres_denoise_tpu.io.fits import read_image, write_bintable
    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR

    # ONNX checkpoint at the production architecture (registry config)
    model = GeneratorRRDB_SR(num_filters=32, num_res_blocks=4, num_upsample=1)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ckpt = export_onnx_params(template, tmp_path / "weights.onnx")

    # synthetic PPS directory (EPN geometry)
    pps = tmp_path / "pps"
    pps.mkdir()
    g = np.random.default_rng(0)
    n = 5000
    x0, x1, y0, y1 = -16120, 16119, -16440, 16439
    write_bintable(
        pps / "P0PNS003PIEVLI0000.FTZ",
        {
            "TIME": np.sort(g.uniform(0, 30_000, n)),
            "DETX": g.integers(x0, x1 + 1, n).astype(np.int32),
            "DETY": g.integers(y0, y1 + 1, n).astype(np.int32),
            "PI": g.integers(150, 12_000, n).astype(np.int32),
            "PATTERN": g.integers(0, 5, n).astype(np.int32),
            "FLAG": np.zeros(n, np.int32),
        },
        extname="EVENTS",
        header={"INSTRUME": "EPN", "ONTIME": 30_000.0,
                "CRPIX1": 202.0, "CRPIX2": 206.0, "CDELT1": -0.001111,
                "CDELT2": 0.001111, "PA_PNT": 80.0},
        column_limits={"DETX": (x0, x1), "DETY": (y0, y1)},
    )
    (pps / "P0OBX000CALIND0000.FTZ").write_bytes(b"\x00")

    run = _write_run_config(tmp_path)
    # production resolutions for the real model
    cfg = run.read_text().replace("res = 32", "res = 416").replace(
        "res = 64", "res = 832"
    )
    run.write_text(cfg)

    rc = main([
        "end2end", "--pps", str(pps), "--checkpoint", str(ckpt),
        "--out", str(tmp_path / "out"), "--run_config", str(run),
        "--max_expo", "-1",
    ])
    assert rc == 0
    preds = list((tmp_path / "out").glob("*predict*.fits.gz"))
    assert preds, "expected prediction product"
    img, hdr = read_image(preds[0])
    assert img.shape == (832, 832)


def test_cli_export_roundtrip(tmp_path):
    """fit -> export best checkpoint to onnx + npz -> reload equal params."""
    import jax
    import numpy as np

    from xmm_superres_denoise_tpu.cli import main
    from xmm_superres_denoise_tpu.config import (
        LossCfg, ModelCfg, OptimizerCfg, RrdbCfg, TrainerCfg,
    )
    from xmm_superres_denoise_tpu.data import XmmDataModule
    from xmm_superres_denoise_tpu.train import Trainer, create_loss

    run = _write_run_config(tmp_path)
    from xmm_superres_denoise_tpu.cli import load_run_config

    ds_cfg, _, t_cfg, _, _ = load_run_config(run, res_dir=ROOT / "res")
    dm = XmmDataModule(ds_cfg, splits_root=tmp_path / "splits", boring_size=16)
    mc = ModelCfg(
        name="esr_gen", memory_efficient=False, batch_size=8,
        model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    t_cfg.log_images_every_n_epochs = 0
    trainer = Trainer(mc, t_cfg, dm, create_loss(None, LossCfg(l1=1.0)),
                      metric_names=["l1"])
    trainer.fit()

    # export via CLI (npz; onnx covered by test_onnx_import roundtrip)
    run_small = tmp_path / "run_small.toml"
    run_small.write_text(run.read_text())
    import optax

    from xmm_superres_denoise_tpu.train.checkpoints import (
        CheckpointManager, load_params_npz, save_params_npz,
    )
    from xmm_superres_denoise_tpu.train.steps import TrainState

    # direct export path (the CLI wraps exactly these calls with the
    # registry-sized model; here the trained model is the small test one)
    import jax.numpy as jnp

    template = trainer.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
    )
    state, step = trainer.ckpt.restore_best(
        TrainState.create(template, optax.adam(1e-4))
    )
    out = tmp_path / "weights.npz"
    save_params_npz(out, state.params)
    back = load_params_npz(out, template)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_strategy_fsdp_defaults_mesh(tmp_path):
    """trainer.strategy='fsdp' must shard params by default (mesh.fsdp=2)
    instead of silently no-opping (reference train.py:142-146)."""
    p = _write_run_config(tmp_path)
    txt = p.read_text().replace('strategy = "auto"', 'strategy = "fsdp"')
    p.write_text(txt)
    _, _, t, _, _ = load_run_config(p, res_dir=ROOT / "res")
    assert t.mesh.fsdp == 2
    # an explicit mesh.fsdp wins over the legacy knob
    txt = txt.replace("fsdp = 1", "fsdp = 4")
    p.write_text(txt)
    _, _, t, _, _ = load_run_config(p, res_dir=ROOT / "res")
    assert t.mesh.fsdp == 4


def test_mesh_remat_forces_memory_efficient(tmp_path):
    """trainer.mesh.remat=true flips the model's remat path on."""
    p = _write_run_config(tmp_path)
    txt = p.read_text().replace(
        "[trainer.mesh]", "[trainer.mesh]\nremat = true"
    )
    p.write_text(txt)
    _, m, _, _, _ = load_run_config(p, res_dir=ROOT / "res")
    assert m.memory_efficient is True


def test_inference_engine_crop_p(tmp_path):
    """crop_p<1 crops the padded input per crop_mode before normalization
    (reference run_inference_on_file.py:144-152, transforms/crop.py:4-62)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xmm_superres_denoise_tpu.cli import load_run_config as lrc
    from xmm_superres_denoise_tpu.infer.run_file import InferenceEngine
    from xmm_superres_denoise_tpu.models.registry import build_model

    p = _write_run_config(tmp_path)
    ds, m, _, _, _ = lrc(p, res_dir=ROOT / "res")
    model = build_model(m, (32, 32), (64, 64))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    raw = np.random.default_rng(0).uniform(0, 1, (28, 30)).astype(np.float32)

    eng = InferenceEngine(m, ds, params, crop_p=0.5)
    pred, inp = eng(raw)
    assert inp.shape == (16, 16)          # 32 * 0.5, center crop
    assert pred.shape == (32, 32)         # SR 2x of the crop

    eng_full = InferenceEngine(m, ds, params)
    pred_f, inp_f = eng_full(raw)
    assert inp_f.shape == (32, 32) and pred_f.shape == (64, 64)
    # the center-cropped input equals the matching slice of the full input
    np.testing.assert_allclose(inp, inp_f[8:24, 8:24], rtol=1e-6)


def test_cli_serve_batched(tmp_path):
    """`serve` subcommand: glob of detxy FITS through one warm engine ->
    per-file product pairs + one JSON summary line."""
    import jax
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.cli import main
    from xmm_superres_denoise_tpu.infer.onnx_import import export_onnx_params
    from xmm_superres_denoise_tpu.io.fits import read_image, write_image
    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR

    model = GeneratorRRDB_SR(num_filters=32, num_res_blocks=4, num_upsample=1)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ckpt = export_onnx_params(template, tmp_path / "weights.onnx")

    g = np.random.default_rng(0)
    for i in range(3):
        hdr = {"EXPOSURE": 20_000.0, "CRPIX1": 10.0, "CRPIX2": 12.0,
               "CRVAL1": 150.0, "CRVAL2": 2.0, "CDELT1": -0.001111,
               "CDELT2": 0.001111, "PA_PNT": 65.0}
        write_image(tmp_path / f"det{i}.fits",
                    g.poisson(2.0, (28, 30)).astype(np.int32), hdr)

    run = _write_run_config(tmp_path)
    rc = main([
        "serve", str(tmp_path / "det*.fits"),
        "--checkpoint", str(ckpt), "--out", str(tmp_path / "out"),
        "--run_config", str(run), "--batch", "2",
    ])
    assert rc == 0
    preds = sorted((tmp_path / "out").glob("*predict*.fits.gz"))
    assert len(preds) == 3
    img, _ = read_image(preds[0])
    assert img.shape == (64, 64)

    # a typo'd pattern must fail fast with rc=2 (no engine build, no
    # FileNotFoundError traceback from deep inside serving)
    rc = main([
        "serve", str(tmp_path / "det*.fist"),
        "--checkpoint", str(ckpt), "--out", str(tmp_path / "out2"),
        "--run_config", str(run),
    ])
    assert rc == 2

    # --mesh_data 2: batches shard over a 2-device data mesh (virtual CPU
    # mesh from conftest); products identical to the single-device run
    rc = main([
        "serve", str(tmp_path / "det*.fits"),
        "--checkpoint", str(ckpt), "--out", str(tmp_path / "out_mesh"),
        "--run_config", str(run), "--batch", "2", "--mesh_data", "2",
    ])
    assert rc == 0
    for f in sorted((tmp_path / "out").glob("*predict*.fits.gz")):
        a, _ = read_image(f)
        b, _ = read_image(tmp_path / "out_mesh" / f.name)
        np.testing.assert_array_equal(a, b)


def test_engine_subcommands_accept_mesh_data():
    """Every subcommand that builds an InferenceEngine must register
    --mesh_data (docs/SERVING.md documents it for all four); a missing
    registration makes documented multi-chip serving unreachable."""
    from xmm_superres_denoise_tpu.cli import build_parser

    parser = build_parser()
    argvs = {
        "infer": ["infer", "--fits", "f", "--checkpoint", "c", "--out", "o",
                  "--run_config", "r"],
        "serve": ["serve", "f", "--checkpoint", "c", "--out", "o",
                  "--run_config", "r"],
        "http": ["http", "--checkpoint", "c", "--run_config", "r"],
        "end2end": ["end2end", "--pps", "p", "--checkpoint", "c", "--out",
                    "o", "--run_config", "r"],
    }
    for name, argv in argvs.items():
        args = parser.parse_args(argv + ["--mesh_data", "-1"])
        assert args.mesh_data == -1, name


def test_print_logs_json_is_strict_json(capsys):
    """fit/test metric dumps must be strict JSON for tooling consumers:
    non-finite values (empty-split metrics) serialize as null, never the
    non-standard NaN/Infinity tokens."""
    import json as _json

    from xmm_superres_denoise_tpu.cli import _print_logs_json

    _print_logs_json({
        "test/loss": float("nan"),
        "test/linear/psnr": float("inf"),
        "test/linear/l1": 0.25,
    })
    out = capsys.readouterr().out
    parsed = _json.loads(out)  # strict parse: NaN token would not raise
    assert _json.loads(out, parse_constant=lambda c: (_ for _ in ()).throw(
        ValueError(c)
    )) == parsed  # belt-and-braces: no Infinity/NaN constants present
    assert parsed == {
        "test/loss": None,
        "test/linear/psnr": None,
        "test/linear/l1": 0.25,
    }


def test_snapshot_run_config(tmp_path):
    """Every fit records the exact TOML that produced the checkpoint dir;
    resuming with an EDITED config keeps the original and adds a numbered
    sidecar instead of overwriting history."""
    from types import SimpleNamespace

    from xmm_superres_denoise_tpu.cli import _snapshot_run_config

    root = tmp_path / "ckpt_root"
    root.mkdir()
    trainer = SimpleNamespace(ckpt=SimpleNamespace(root=root))
    cfg = tmp_path / "run.toml"
    cfg.write_text("[trainer]\nepochs = 1\n")

    _snapshot_run_config(trainer, cfg)
    assert (root / "run_config.toml").read_text() == cfg.read_text()

    # same config again: idempotent, no sidecar
    _snapshot_run_config(trainer, cfg)
    assert not (root / "run_config.1.toml").exists()

    # edited config: original stays, sidecar appears
    cfg.write_text("[trainer]\nepochs = 2\n")
    _snapshot_run_config(trainer, cfg)
    assert "epochs = 1" in (root / "run_config.toml").read_text()
    assert "epochs = 2" in (root / "run_config.1.toml").read_text()

    # resuming again with the SAME already-recorded edit: no duplicate
    _snapshot_run_config(trainer, cfg)
    assert not (root / "run_config.2.toml").exists()

    # a second distinct edit gets the next slot
    cfg.write_text("[trainer]\nepochs = 3\n")
    _snapshot_run_config(trainer, cfg)
    assert "epochs = 3" in (root / "run_config.2.toml").read_text()
