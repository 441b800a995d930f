"""watch_and_serve: directory-watching production serving daemon.

Contract: only size/mtime-stable files are picked up; work identity is
(path, size, mtime); a state file makes restarts skip served history; a
corrupt input is isolated per-file and recorded, never wedging the queue.
"""

import json
import os
from pathlib import Path

import jax
import numpy as np

from xmm_superres_denoise_tpu.config import (
    DatasetCfg,
    HrDatasetCfg,
    LrDatasetCfg,
    ModelCfg,
    OptimizerCfg,
    RrdbCfg,
)
from xmm_superres_denoise_tpu.infer.run_file import (
    InferenceEngine,
    watch_and_serve,
)
from xmm_superres_denoise_tpu.io.fits import write_image


def _engine():
    ds = DatasetCfg(
        directory=Path("."),
        lr=LrDatasetCfg(bkg=0, exps=[20], clamp_max=0.0022336, res=416),
        hr=HrDatasetCfg(exp=100, clamp_max=0.0005584, res=832),
        scaling="sqrt",
        type="boring",
    )
    mc = ModelCfg(
        name="esr_gen", memory_efficient=False, batch_size=1,
        model=RrdbCfg(base_model="esr_gen", filters=4, residual_blocks=1),
        optimizer=OptimizerCfg(learning_rate=1e-4),
    )
    from xmm_superres_denoise_tpu.models.registry import build_model

    import jax.numpy as jnp

    model = build_model(mc, (416, 416), (832, 832))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 416, 416, 1)))
    return InferenceEngine(mc, ds, params), ds


def _drop_detxy(d: Path, name: str, seed=0) -> Path:
    g = np.random.default_rng(seed)
    img = g.poisson(2.0, (411, 403)).astype(np.float32)
    hdr = {
        "EXPOSURE": 20_000.0, "CRPIX1": 200.0, "CRPIX2": 205.0,
        "CRVAL1": 150.0, "CRVAL2": 2.0, "CDELT1": -0.001111,
        "CDELT2": 0.001111, "PA_PNT": 65.0,
        "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
    }
    return write_image(d / name, img, header=hdr)


def _products(out: Path):
    return sorted(p.name for p in out.glob("*.fits*"))


def test_watch_serves_stable_files_and_skips_served(tmp_path):
    engine, _ = _engine()
    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    _drop_detxy(watch, "a.fits")

    # poll 1 sees a.fits (unstable: first sighting) -> nothing served;
    # poll 2 sees it unchanged -> served
    n = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2,
    )
    assert n == 1
    first = _products(out)
    assert len(first) == 2  # input + prediction products

    # more polls without new files: nothing reprocessed
    n = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2,
        state_path=None,
    )
    # NOTE: without a state file a NEW daemon instance re-serves history;
    # that is the documented state-file contract, covered below. Within
    # one instance, the served-set prevents it:
    assert n == 1  # fresh instance, no state: re-serves once


def test_watch_state_file_survives_restart(tmp_path):
    engine, _ = _engine()
    watch = tmp_path / "in"
    out = tmp_path / "out"
    state = tmp_path / "state.json"
    watch.mkdir()
    _drop_detxy(watch, "a.fits")

    n1 = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2, state_path=state,
    )
    assert n1 == 1 and state.exists()
    served = json.loads(state.read_text())
    assert list(served.values()) == ["ok"]

    # restart: same file untouched -> skipped
    n2 = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2, state_path=state,
    )
    assert n2 == 0

    # overwrite the input (new mtime/size identity) -> served again, and
    # the overwritten version's dead key is pruned from the state (a
    # rotating production directory must not grow the state forever)
    _drop_detxy(watch, "a.fits", seed=1)
    os.utime(watch / "a.fits", ns=(1, 10**15))
    n3 = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2, state_path=state,
    )
    assert n3 == 1
    served = json.loads(state.read_text())
    assert len(served) == 1  # only the live version remains on record

    # deleted input: its key is pruned on the next daemon pass
    (watch / "a.fits").unlink()
    n4 = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2, state_path=state,
    )
    assert n4 == 0
    assert json.loads(state.read_text()) == {}


def test_watch_new_arrivals_between_polls(tmp_path):
    """A file dropped after the daemon starts is served once stable."""
    engine, _ = _engine()
    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    _drop_detxy(watch, "a.fits")

    import threading

    dropped = threading.Event()
    orig_wait = threading.Event.wait

    class DropOnce:
        def __init__(self):
            self.polls = 0

    # drop b.fits after the first poll via the stop event's wait hook
    stop = threading.Event()
    counter = DropOnce()

    def wait_hook(self, timeout=None):
        if self is stop:
            counter.polls += 1
            if counter.polls == 1:
                _drop_detxy(watch, "b.fits", seed=2)
                dropped.set()
            return False
        return orig_wait(self, timeout)

    threading.Event.wait = wait_hook
    try:
        n = watch_and_serve(
            watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
            poll_s=0.01, max_polls=4, stop=stop,
        )
    finally:
        threading.Event.wait = orig_wait
    assert dropped.is_set()
    assert n == 2
    names = _products(out)
    assert any("a_" in x or x.startswith("a") for x in names)
    assert any("b_" in x or x.startswith("b") for x in names)


def test_cli_serve_watch_drain_mode(tmp_path):
    """`serve --watch --max_polls N` through the real CLI: directories are
    polled, stable files served, one `{"served": n}` JSON line printed, and
    the state file makes a second drain a no-op."""
    import contextlib
    import io

    import jax.numpy as jnp

    from xmm_superres_denoise_tpu.cli import main
    from xmm_superres_denoise_tpu.infer.onnx_import import export_onnx_params
    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR

    model = GeneratorRRDB_SR(num_filters=32, num_res_blocks=4, num_upsample=1)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ckpt = export_onnx_params(template, tmp_path / "weights.onnx")

    watch = tmp_path / "in"
    watch.mkdir()
    g = np.random.default_rng(0)
    hdr = {"EXPOSURE": 20_000.0, "CRPIX1": 10.0, "CRPIX2": 12.0,
           "CRVAL1": 150.0, "CRVAL2": 2.0, "CDELT1": -0.001111,
           "CDELT2": 0.001111, "PA_PNT": 65.0}
    write_image(watch / "det0.fits", g.poisson(2.0, (28, 30)).astype(np.int32),
                header=hdr)

    from tests.test_cli import _write_run_config

    run = _write_run_config(tmp_path)
    args = [
        "serve", str(watch),
        "--checkpoint", str(ckpt), "--out", str(tmp_path / "out"),
        "--run_config", str(run), "--batch", "2",
        "--watch", "--poll", "0.01", "--max_polls", "3",
        "--state", str(tmp_path / "state.json"),
    ]
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(args)
    assert rc == 0
    assert json.loads(out.getvalue().strip().splitlines()[-1]) == {"served": 1}
    assert len(sorted((tmp_path / "out").glob("*predict*.fits.gz"))) == 1

    # drain again: state file skips history
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(args)
    assert rc == 0
    assert json.loads(out.getvalue().strip().splitlines()[-1]) == {"served": 0}

    # a positional that is not a directory fails fast with rc=2
    rc = main([
        "serve", str(watch / "det0.fits"),
        "--checkpoint", str(ckpt), "--out", str(tmp_path / "out2"),
        "--run_config", str(run), "--watch",
    ])
    assert rc == 2


def test_watch_isolates_corrupt_input(tmp_path):
    engine, _ = _engine()
    watch = tmp_path / "in"
    out = tmp_path / "out"
    state = tmp_path / "state.json"
    watch.mkdir()
    _drop_detxy(watch, "good.fits")
    (watch / "bad.fits").write_bytes(b"NOT A FITS FILE")

    n = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2, state_path=state,
    )
    assert n == 1  # the good file was served despite the corrupt one
    served = json.loads(state.read_text())
    stats = sorted(v if v == "ok" else "error" for v in
                   (s.split(":")[0] for s in served.values()))
    assert stats == ["error", "ok"]

    # the corrupt file is not retried on later polls
    n2 = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        poll_s=0.01, max_polls=2, state_path=state,
    )
    assert n2 == 0


def test_watch_oom_batch_degrades_to_single_tile(tmp_path, monkeypatch):
    """A batch-sized device OOM (e.g. --batch misconfigured beyond the
    serve-path memory knee) must degrade the daemon to working batch-1
    programs — every good file still gets its products — instead of
    recording every file as permanently failed."""
    engine, _ = _engine()
    watch = tmp_path / "in"
    out = tmp_path / "out"
    state = tmp_path / "state.json"
    watch.mkdir()
    _drop_detxy(watch, "a.fits", seed=1)
    _drop_detxy(watch, "b.fits", seed=2)

    real = engine.run_tiles

    def oom_at_big_batch(raw, batch_size=32):
        if batch_size > 1:
            raise RuntimeError(
                f"device out of memory serving batch_size={batch_size}"
            )
        return real(raw, batch_size=batch_size)

    monkeypatch.setattr(engine, "run_tiles", oom_at_big_batch)
    n = watch_and_serve(
        watch, engine, out, hr_exp_ks=100.0, model_name="esr_gen",
        batch_size=64, poll_s=0.01, max_polls=2, state_path=state,
    )
    assert n == 2, json.loads(state.read_text())
    served = json.loads(state.read_text())
    assert sorted(served.values()) == ["ok", "ok"]
    names = _products(out)
    assert any("a_" in nm for nm in names) and any("b_" in nm for nm in names)
