"""Inference path: engine pipeline, WCS product writing, end-to-end obsid."""

from pathlib import Path

import jax
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
from xmm_superres_denoise_tpu.infer.run_file import InferenceEngine, infer_file
from xmm_superres_denoise_tpu.io.fits import read_image, write_bintable, write_image

REF_MASK = Path("/root/reference/res/detector_mask/pn_mask_500_2000_detxy_1x.ds")


def _engine(sr=True, lr_res=416, with_mask=True):
    hr_res = lr_res * 2 if sr else lr_res
    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=lr_res),
        hr=HrDatasetCfg(
            exp=100 if sr else 50,
            clamp_max=0.0005584 if sr else 0.0022336,
            res=hr_res,
        ),
        scaling="sqrt",
        type="boring",
    )
    name = "esr_gen" if sr else "rrdb_denoise"
    mc = ModelCfg(
        name=name,
        memory_efficient=False,
        batch_size=1,
        model=RrdbCfg(base_model=name, filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    model = build_model(mc, (lr_res, lr_res), (hr_res, hr_res))
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, lr_res, lr_res, 1)))
    mask = None
    if with_mask and REF_MASK.exists():
        mask, _ = read_image(REF_MASK)
        mask = mask.astype(np.float32)
    return InferenceEngine(mc, ds, params, det_mask=mask), ds


def _write_detxy(tmp_path, seed=0):
    g = np.random.default_rng(seed)
    img = g.poisson(2.0, (411, 403)).astype(np.int32)
    hdr = {
        "EXPOSURE": 20_000.0,
        "CRPIX1": 200.0,
        "CRPIX2": 205.0,
        "CRVAL1": 150.0,
        "CRVAL2": 2.0,
        "CDELT1": -0.001111,
        "CDELT2": 0.001111,
        "PA_PNT": 65.0,
        "CTYPE1": "RA---TAN",
        "CTYPE2": "DEC--TAN",
    }
    path = tmp_path / "pn_500_2000_detxy_image_20ks.fits"
    write_image(path, img, hdr)
    return path


def test_engine_shapes():
    engine, _ = _engine(sr=True)
    raw = np.random.default_rng(1).uniform(0, 0.001, (411, 403)).astype(np.float32)
    pred, inp = engine(raw)
    assert pred.shape == (832, 832)
    assert inp.shape == (416, 416)
    assert pred.min() >= 0.0


def test_infer_file_products_and_wcs(tmp_path):
    engine, ds = _engine(sr=True)
    detxy = _write_detxy(tmp_path)
    p_in, p_pred = infer_file(
        detxy, engine, tmp_path / "out", hr_exp_ks=100.0, model_name="esr_gen",
        plot=False,
    )
    assert p_in.exists() and p_pred.exists()

    img_in, h_in = read_image(p_in)
    img_pred, h_pred = read_image(p_pred)
    assert img_in.shape == (416, 416)
    assert img_pred.shape == (832, 832)

    # WCS carry-through: pad shift +6/+2 on the input product
    assert h_in["CRPIX1"] == 200.0 + 6
    assert h_in["CRPIX2"] == 205.0 + 2
    # 2x product: CRPIX/CDELT rescale + CD matrix (filehandling.py:211-230)
    assert h_pred["CRPIX1"] == 2 * (200.0 + 6) + 0.5
    np.testing.assert_allclose(h_pred["CDELT1"], -0.001111 / 2, rtol=1e-5)
    assert "CD1_1" in h_pred and "CROT2" in h_pred
    assert h_pred["EXPOSURE"] == 100_000.0


def test_end2end_native_obsid(tmp_path):
    engine, _ = _engine(sr=True)
    # synthetic PPS directory
    pps = tmp_path / "pps"
    pps.mkdir()
    g = np.random.default_rng(3)
    n = 20000
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
    rate = np.full_like(t, 0.2)
    write_bintable(
        pps / "P0000000000PNS003FBKTSR0000.FTZ",
        {"TIME": t, "RATE": rate},
        extname="RATE",
        header={"FLCUTTHR": 0.5},
        primary_header={"INSTRUME": "EPN", "OBS_ID": "0000000000"},
    )
    (pps / "P0000000000OBX000CALIND0000.FTZ").write_bytes(b"\x00")

    from xmm_superres_denoise_tpu.infer.end2end import run_end2end

    result = run_end2end(
        pps, engine, tmp_path / "out", hr_exp_ks=100.0, model_name="esr_gen",
        plot=False,
    )
    assert Path(result["detxy"]).exists()
    assert Path(result["prediction"]).exists()
    img, hdr = read_image(result["detxy"])
    assert img.shape == (411, 403)
    assert result["latency_s"]["total"] > 0
    pred, _ = read_image(result["prediction"])
    assert pred.shape == (832, 832)


def test_engine_bf16_close_to_f32():
    """bf16 serving mode stays close to the f32 parity mode."""
    import jax
    import jax.numpy as jnp

    lr_res = 64
    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=lr_res),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=lr_res),
        scaling="sqrt",
        type="boring",
    )
    mc = ModelCfg(
        name="rrdb_denoise", memory_efficient=False, batch_size=1,
        model=RrdbCfg(base_model="rrdb_denoise", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    model = build_model(mc, (lr_res, lr_res), (lr_res, lr_res))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, lr_res, lr_res, 1)))
    engine32 = InferenceEngine(mc, ds, params)
    engine16 = InferenceEngine(mc, ds, params, dtype=jnp.bfloat16)
    raw = np.random.default_rng(9).uniform(0, 0.001, (64, 64)).astype(np.float32)
    p32, _ = engine32(raw)
    p16, _ = engine16(raw)
    assert p16.shape == p32.shape
    denom = max(np.abs(p32).max(), 1e-9)
    assert np.abs(p16 - p32).max() / denom < 0.05  # bf16 tolerance


def test_infer_file_plotting(tmp_path):
    engine, _ = _engine(sr=False, lr_res=416)
    detxy = _write_detxy(tmp_path, seed=5)
    infer_file(detxy, engine, tmp_path / "out", hr_exp_ks=50.0,
               model_name="rrdb_denoise", plot=True)
    assert (tmp_path / "out" / "plot_in.png").exists()
    assert (tmp_path / "out" / "plot_out.png").exists()


def test_engine_int8_close_to_f32():
    """w8a8 quantized serving (lazy first-batch calibration) stays close to
    the f32 parity mode and reuses the calibrated program on later calls."""
    import jax
    import jax.numpy as jnp

    lr_res = 64
    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=lr_res),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=lr_res),
        scaling="sqrt",
        type="boring",
    )
    mc = ModelCfg(
        name="rrdb_denoise", memory_efficient=False, batch_size=1,
        model=RrdbCfg(base_model="rrdb_denoise", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    model = build_model(mc, (lr_res, lr_res), (lr_res, lr_res))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, lr_res, lr_res, 1)))
    engine32 = InferenceEngine(mc, ds, params)
    engine8 = InferenceEngine(mc, ds, params, quantize=True)
    raw = np.random.default_rng(9).uniform(0, 0.001, (64, 64)).astype(np.float32)
    p32, _ = engine32(raw)
    p8, _ = engine8(raw)
    assert p8.shape == p32.shape
    denom = max(np.abs(p32).max(), 1e-9)
    assert np.abs(p8 - p32).max() / denom < 0.08  # int8 tolerance
    # second call: calibrated program reused, same answer
    p8b, _ = engine8(raw)
    np.testing.assert_array_equal(p8, p8b)


def test_engine_int8_rejects_non_rrdb():
    import pytest as _pytest

    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=64),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=64),
        scaling="sqrt",
        type="boring",
    )
    from xmm_superres_denoise_tpu.config.schema import TransformerCfg

    mc = ModelCfg(
        name="swinir", memory_efficient=False, batch_size=1,
        model=TransformerCfg(
            base_model="swinir", img_size=64, window_size=8, patch_size=1,
            embed_dim=16, depths=[2], num_heads=[2], mlp_ratio=2.0,
            upsampler="pixelshuffle",
        ),
        optimizer=OptimizerCfg(learning_rate=2e-4),
    )
    with _pytest.raises(ValueError, match="RRDB"):
        InferenceEngine(mc, ds, {"params": {}}, quantize=True)


def test_engine_mesh_and_predict_tiles():
    """Engine with a data mesh: batch-sharded serving matches unsharded,
    and predict_tiles chunks arbitrary stacks with one compiled shape."""
    import jax
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.parallel import make_mesh

    lr_res = 32
    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=lr_res),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=lr_res),
        scaling="sqrt",
        type="boring",
    )
    mc = ModelCfg(
        name="rrdb_denoise", memory_efficient=False, batch_size=1,
        model=RrdbCfg(base_model="rrdb_denoise", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    model = build_model(mc, (lr_res, lr_res), (lr_res, lr_res))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, lr_res, lr_res, 1)))

    plain = InferenceEngine(mc, ds, params)
    sharded = InferenceEngine(mc, ds, params, mesh=make_mesh(data=8))
    g = np.random.default_rng(11)
    raw = g.uniform(0, 0.001, (8, lr_res, lr_res)).astype(np.float32)
    p0, _ = plain(raw)
    p1, _ = sharded(raw)
    np.testing.assert_allclose(p1, p0, rtol=1e-6, atol=1e-7)

    # 11 tiles through batch_size=4 -> 3 chunks, tail padded+trimmed
    raw11 = g.uniform(0, 0.001, (11, lr_res, lr_res)).astype(np.float32)
    tiled = plain.predict_tiles(raw11, batch_size=4)
    assert tiled.shape[0] == 11
    direct, _ = plain(raw11[8:])  # spot-check the tail samples
    np.testing.assert_allclose(tiled[8:], direct, rtol=1e-6, atol=1e-7)


def test_engine_mesh_non_divisible_batch():
    """A batch NOT divisible by the mesh data-axis size is padded inside the
    engine (repeating the last tile) and trimmed on return — any batch
    serves on any mesh."""
    import jax
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.parallel import make_mesh

    lr_res = 32
    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=lr_res),
        hr=HrDatasetCfg(exp=50, clamp_max=0.0022336, res=lr_res),
        scaling="sqrt",
        type="boring",
    )
    mc = ModelCfg(
        name="rrdb_denoise", memory_efficient=False, batch_size=1,
        model=RrdbCfg(base_model="rrdb_denoise", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    model = build_model(mc, (lr_res, lr_res), (lr_res, lr_res))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, lr_res, lr_res, 1)))

    plain = InferenceEngine(mc, ds, params)
    sharded = InferenceEngine(mc, ds, params, mesh=make_mesh(data=8))
    g = np.random.default_rng(7)
    raw = g.uniform(0, 0.001, (5, lr_res, lr_res)).astype(np.float32)
    p0, i0 = plain(raw)
    p1, i1 = sharded(raw)
    assert p1.shape[0] == 5 and i1.shape[0] == 5
    np.testing.assert_allclose(p1, p0, rtol=1e-6, atol=1e-7)

    # predict_tiles on the sharded engine: chunk 4 is padded to 8 internally
    tiled = sharded.predict_tiles(raw, batch_size=4)
    np.testing.assert_allclose(tiled, p0, rtol=1e-6, atol=1e-7)


def test_int8_scales_fingerprint_binding(tmp_path):
    """params_fingerprint distinguishes checkpoints (value-sensitive) and is
    stable for identical trees — the binding used by cli --int8_scales."""
    import jax
    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.utils.fingerprint import params_fingerprint

    model_params = {"params": {"conv": {"kernel": np.ones((3, 3, 1, 4), np.float32),
                                        "bias": np.zeros((4,), np.float32)}}}
    fp1 = params_fingerprint(model_params)
    fp2 = params_fingerprint(jax.tree_util.tree_map(np.copy, model_params))
    assert fp1 == fp2
    other = jax.tree_util.tree_map(lambda a: a + 1e-3, model_params)
    assert params_fingerprint(other) != fp1


def test_serve_files_matches_single_file_path(tmp_path):
    """Batched serving (serve_files: one warm engine, pipelined
    predict_tiles + denorm_inputs) emits products identical to the
    single-file infer_file path for every input."""
    from xmm_superres_denoise_tpu.infer.run_file import serve_files

    engine, ds = _engine(sr=True)
    files = []
    for i in range(3):
        d = tmp_path / f"f{i}"
        d.mkdir()
        # identical basenames across directories: serve_files must
        # disambiguate product stems instead of clobbering (obsA/img.fits
        # and obsB/img.fits into one --out dir)
        files.append(_write_detxy(d, seed=i))

    served = serve_files(
        files, engine, tmp_path / "served", hr_exp_ks=100.0,
        model_name="esr_gen", batch_size=2, plot=False,
    )
    assert len(served) == 3
    all_products = [p for pair in served for p in pair]
    assert len(set(all_products)) == len(all_products), all_products
    for f, (s_in, s_pred) in zip(files, served):
        r_in, r_pred = infer_file(
            f, engine, tmp_path / "single" / f.parent.name,
            hr_exp_ks=100.0, model_name="esr_gen", plot=False,
        )
        img_s, h_s = read_image(s_pred)
        img_r, h_r = read_image(r_pred)
        np.testing.assert_allclose(img_s, img_r, atol=1e-6)
        assert h_s["CRPIX1"] == h_r["CRPIX1"]
        in_s, _ = read_image(s_in)
        in_r, _ = read_image(r_in)
        np.testing.assert_allclose(in_s, in_r, atol=1e-6)


def test_write_products_stem_with_input_predict_words(tmp_path):
    """Product names derive from the stem directly: the old
    replace('input','predict') on the full name mangled stems containing
    'input'/'predict' and could collide two different files' products."""
    from xmm_superres_denoise_tpu.infer.run_file import write_products

    inp = np.random.default_rng(0).uniform(0, 1, (16, 16)).astype(np.float32)
    pred = np.random.default_rng(1).uniform(0, 1, (32, 32)).astype(np.float32)
    hdr = {
        "EXPOSURE": 20_000.0, "CRPIX1": 8.0, "CRPIX2": 8.0,
        "CRVAL1": 150.0, "CRVAL2": 2.0, "CDELT1": -0.001111,
        "CDELT2": 0.001111, "PA_PNT": 65.0,
    }
    pairs = {}
    for stem in ("pn_input", "pn_predict"):
        p_in, p_pred = write_products(
            inp, pred, tmp_path, Path(f"{stem}.fits"), 20_000.0, 100.0,
            "esr_gen", hdr, plot=False,
        )
        assert p_in.name.startswith(f"{stem}_input_wcs")
        assert p_pred.name.startswith(f"{stem}_predict_wcs")
        pairs[stem] = (p_in, p_pred)
    all_paths = [p for pair in pairs.values() for p in pair]
    assert len(set(all_paths)) == 4, all_paths


def test_tiles_pipeline_oom_degrades_batch(monkeypatch):
    """A device RESOURCE_EXHAUSTED during chunked serving (measured at int8
    b64/b128 on a 16 GB chip) must degrade: halve the chunk batch and
    restart until a size fits, remember the cap on the engine, and only
    raise once even batch 1 exhausts memory."""
    engine, _ = _engine(sr=True, lr_res=32, with_mask=False)
    tiles = np.random.default_rng(3).uniform(
        0, 1e-3, (8, 32, 32)
    ).astype(np.float32)
    expected = engine.predict_tiles(tiles.copy(), batch_size=2)

    real = engine._run_pred
    sizes: list = []

    def run_capped(params, chunk):
        sizes.append(chunk.shape[0])
        if chunk.shape[0] > 2:
            raise Exception("RESOURCE_EXHAUSTED: TPU backend error")
        return real(params, chunk)

    monkeypatch.setattr(engine, "_run_pred", run_capped)
    out = engine.predict_tiles(tiles, batch_size=8)
    assert out.shape[0] == 8
    np.testing.assert_allclose(out, expected, rtol=0, atol=0)
    assert engine._serve_batch_cap == 2
    assert sizes == [8, 4, 2, 2, 2, 2]  # 8 OOM -> 4 OOM -> 2 fits (4 chunks)

    # the remembered cap short-circuits rediscovery on the next call
    sizes.clear()
    engine.predict_tiles(tiles, batch_size=8)
    assert sizes == [2, 2, 2, 2]

    # a persistent OOM (even at batch 1) surfaces as a RuntimeError
    def boom(params, chunk):
        raise Exception("RESOURCE_EXHAUSTED: TPU backend error")

    monkeypatch.setattr(engine, "_run_pred", boom)
    with pytest.raises(RuntimeError, match="batch_size=1"):
        engine.predict_tiles(tiles, batch_size=4)

    # any other failure propagates untouched
    def other(params, chunk):
        raise ValueError("unrelated")

    monkeypatch.setattr(engine, "_run_pred", other)
    engine._serve_batch_cap = 4
    with pytest.raises(ValueError, match="unrelated"):
        engine.predict_tiles(tiles, batch_size=4)
