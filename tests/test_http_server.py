"""HTTP inference service (infer/http_server.py): POST a detxy FITS ->
the same WCS product bytes the file pipelines write; health/stats
endpoints; malformed inputs answered with 400, never a wedged server.
"""

import gzip
import json
import threading
import urllib.error
import urllib.request
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
from xmm_superres_denoise_tpu.infer.http_server import InferenceHTTPServer
from xmm_superres_denoise_tpu.infer.run_file import (
    InferenceEngine,
    infer_file,
)
from xmm_superres_denoise_tpu.io.fits import read_image, write_image


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


def _detxy_bytes(tmp_path, seed=0) -> bytes:
    g = np.random.default_rng(seed)
    img = g.poisson(2.0, (411, 403)).astype(np.float32)
    hdr = {
        "EXPOSURE": 20_000.0, "CRPIX1": 200.0, "CRPIX2": 205.0,
        "CRVAL1": 150.0, "CRVAL2": 2.0, "CDELT1": -0.001111,
        "CDELT2": 0.001111, "PA_PNT": 65.0,
        "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
    }
    p = write_image(tmp_path / "req.fits", img, header=hdr)
    return p.read_bytes()


class _Server:
    """Context manager: a live server on a free port + its base URL."""

    def __init__(self, engine):
        self.server = InferenceHTTPServer(
            ("127.0.0.1", 0), engine, hr_exp_ks=100.0, model_name="esr_gen",
        )
        self.url = "http://127.0.0.1:%d" % self.server.server_address[1]
        self.thread = threading.Thread(
            target=self.server.serve_forever,
            kwargs={"poll_interval": 0.05}, daemon=True,
        )

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.thread.join(timeout=10.0)
        self.server.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, body, timeout=120):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, dict(r.headers), r.read()


def test_http_infer_matches_file_pipeline(tmp_path):
    """POST /infer returns byte-identical product FITS to `infer_file` on
    the same input, for both product=prediction and product=input."""
    engine, _ = _engine()
    body = _detxy_bytes(tmp_path)

    # file-pipeline reference products
    p_in, p_pred = infer_file(
        tmp_path / "req.fits", engine, tmp_path / "out",
        hr_exp_ks=100.0, model_name="esr_gen", plot=False,
    )

    with _Server(engine) as s:
        status, headers, blob = _post(s.url + "/infer", body)
        assert status == 200
        assert headers["Content-Type"] == "application/fits"
        assert headers["X-Xmmsr-Model"] == "esr_gen"
        assert float(headers["X-Xmmsr-Exposure-S"]) == 20_000.0
        img_http, hdr_http = read_image(blob)
        img_file, hdr_file = read_image(p_pred)
        np.testing.assert_array_equal(img_http, img_file)
        assert img_http.shape == (832, 832)

        status, _, blob_in = _post(s.url + "/infer?product=input", body)
        assert status == 200
        img_http_in, _ = read_image(blob_in)
        img_file_in, _ = read_image(p_in)
        np.testing.assert_array_equal(img_http_in, img_file_in)
        assert img_http_in.shape == (416, 416)


def test_http_gzipped_upload_and_stats(tmp_path):
    """A gzipped request body decodes transparently (same codec as file
    reads); /healthz and /stats report identity and latency percentiles."""
    engine, _ = _engine()
    body = gzip.compress(_detxy_bytes(tmp_path))

    with _Server(engine) as s:
        status, health = _get(s.url + "/healthz")
        assert status == 200
        assert health == {"status": "ok", "model": "esr_gen",
                          "hr_exp_ks": 100.0}

        status, _, blob = _post(s.url + "/infer", body)
        assert status == 200
        assert read_image(blob)[0].shape == (832, 832)

        status, stats = _get(s.url + "/stats")
        assert status == 200
        assert stats["requests"] == 1 and stats["errors"] == 0
        assert stats["latency_ms"]["count"] == 1
        assert stats["latency_ms"]["p50"] > 0


def test_http_error_paths(tmp_path):
    """Malformed bodies, bad params, and unknown paths answer 4xx JSON and
    the server keeps serving afterwards."""
    engine, _ = _engine()
    good = _detxy_bytes(tmp_path)

    def expect_error(url, body=None, method=None):
        req = urllib.request.Request(
            url, data=body,
            method=method or ("POST" if body is not None else "GET"),
        )
        try:
            urllib.request.urlopen(req, timeout=60)
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())
        raise AssertionError("expected an HTTP error")

    with _Server(engine) as s:
        code, err = expect_error(s.url + "/infer", b"NOT A FITS FILE")
        assert code == 400 and "error" in err

        code, err = expect_error(s.url + "/infer?product=both", good)
        assert code == 400 and "product" in err["error"]

        code, err = expect_error(s.url + "/nope")
        assert code == 404

        code, err = expect_error(s.url + "/infer", b"")
        assert code == 400  # empty body rejected up front

        # wrong geometry (decodes fine, cannot be served): still a 400 —
        # the client's fault, not an internal error
        big = np.zeros((600, 600), np.float32)
        p = write_image(Path(tmp_path) / "big.fits", big,
                        header={"EXPOSURE": 20_000.0})
        code, err = expect_error(s.url + "/infer", p.read_bytes())
        assert code == 400 and "geometry" in err["error"]

        # missing WCS keywords on an SR engine (2x product needs CDELT):
        # also the client's fault -> 400 naming the keyword
        nowcs = np.zeros((411, 403), np.float32)
        p = write_image(Path(tmp_path) / "nowcs.fits", nowcs,
                        header={"EXPOSURE": 20_000.0})
        code, err = expect_error(s.url + "/infer", p.read_bytes())
        assert code == 400 and "WCS keyword" in err["error"]

        # still alive: a good request succeeds after all the failures
        status, _, blob = _post(s.url + "/infer", good)
        assert status == 200
        assert read_image(blob)[0].shape == (832, 832)

        _, stats = _get(s.url + "/stats")
        assert stats["errors"] == 5  # 404s are not /infer errors
        assert stats["requests"] == 6


def test_http_busy_backpressure_and_idle_timeout(tmp_path):
    """With every body slot taken, an upload gets an immediate 503 instead
    of buffering unboundedly; handler sockets carry an idle timeout so a
    stalled upload cannot pin its thread forever. The server keeps serving
    once slots free up."""
    from xmm_superres_denoise_tpu.infer.http_server import (
        MAX_INFLIGHT_BODIES,
        SOCKET_IDLE_TIMEOUT_S,
        _Handler,
    )

    assert _Handler.timeout == SOCKET_IDLE_TIMEOUT_S > 0

    engine, _ = _engine()
    good = _detxy_bytes(tmp_path)

    with _Server(engine) as s:
        for _ in range(MAX_INFLIGHT_BODIES):
            assert s.server.body_slots.acquire(blocking=False)
        try:
            req = urllib.request.Request(
                s.url + "/infer", data=good, method="POST")
            try:
                urllib.request.urlopen(req, timeout=60)
                raise AssertionError("expected 503")
            except urllib.error.HTTPError as e:
                assert e.code == 503
                assert "busy" in json.loads(e.read())["error"]
        finally:
            for _ in range(MAX_INFLIGHT_BODIES):
                s.server.body_slots.release()

        status, _, blob = _post(s.url + "/infer", good)
        assert status == 200
        assert read_image(blob)[0].shape == (832, 832)


def test_http_engine_failure_is_500_and_server_survives(tmp_path, monkeypatch):
    """An engine/device failure is OUR fault: 500 (not 400), logged, and
    the server keeps serving once the engine works again."""
    engine, _ = _engine()
    good = _detxy_bytes(tmp_path)

    # dunder lookup happens on the type, so patch the class (monkeypatch
    # restores it after the test)
    real_call = type(engine).__call__
    broken = {"on": True}

    def flaky(self, rate):
        if broken["on"]:
            raise RuntimeError("injected device loss")
        return real_call(self, rate)

    monkeypatch.setattr(type(engine), "__call__", flaky)
    with _Server(engine) as s:
        req = urllib.request.Request(s.url + "/infer", data=good,
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "internal error" in json.loads(e.read())["error"]

        broken["on"] = False
        status, _, blob = _post(s.url + "/infer", good)
        assert status == 200
        assert read_image(blob)[0].shape == (832, 832)


def test_http_oversized_body_rejected_and_connection_closed(
    tmp_path, monkeypatch
):
    """A Content-Length over the cap answers 400 WITHOUT draining the body
    and closes the connection (an undrained keep-alive socket would parse
    the unread bytes as the next request); the server stays healthy."""
    import xmm_superres_denoise_tpu.infer.http_server as hs

    monkeypatch.setattr(hs, "MAX_BODY_BYTES", 1024)
    engine, _ = _engine()
    good = _detxy_bytes(tmp_path)
    assert len(good) > 1024

    with _Server(engine) as s:
        req = urllib.request.Request(s.url + "/infer", data=good,
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        except (ConnectionResetError, urllib.error.URLError):
            pass  # server may cut the upload mid-send: also acceptable

        monkeypatch.setattr(hs, "MAX_BODY_BYTES", 256 * 1024 * 1024)
        status, _, blob = _post(s.url + "/infer", good)
        assert status == 200
        assert read_image(blob)[0].shape == (832, 832)
