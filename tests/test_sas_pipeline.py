"""SAS subprocess wrappers under a mocked SAS toolchain.

The real binaries are unavailable here, so these tests monkeypatch
`run_sas_command` with a fake that records every invocation and
synthesizes plausible outputs — validating that the constructed command
lines carry the reference's science-critical expressions
(xmmsas_tools.py:437-444, 536-539) and that the WCS fixup applies the
ecoordconv numbers exactly (xmmsas_tools.py:567-618)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

import xmm_superres_denoise_tpu.sas.pipeline as sas
from xmm_superres_denoise_tpu.io.fits import (
    read_image,
    write_bintable,
    write_image,
)


class FakeSAS:
    def __init__(self):
        self.calls = []

    def __call__(self, args):
        self.calls.append(args)
        kv = dict(a.split("=", 1) for a in args[1:] if "=" in a)
        tool = args[0]
        if tool == "tabgtigen":
            write_bintable(
                Path(kv["gtiset"]),
                {"START": np.array([0.0, 5000.0]),
                 "STOP": np.array([4000.0, 20000.0])},
                extname="STDGTI", header={"METHOD": "fake"},
            )
        elif tool == "evselect" and "filteredset" in kv:
            Path(kv["filteredset"]).write_bytes(Path(kv["table"]).read_bytes())
        elif tool == "evselect" and "imageset" in kv:
            hdr = {
                "REFXCDLT": -1.38889e-5, "REFYCDLT": 1.38889e-5,
                "PA_PNT": 80.0,
            }
            write_image(Path(kv["imageset"]),
                        np.zeros((411, 403), np.float32), hdr)
        out = b""
        if tool == "ecoordconv":
            out = (b" IM_X: IM_Y: 206.5 200.5\n"
                   b" RA: DEC: 10.25 -5.5\n")
        return subprocess.CompletedProcess(args, 0, stdout=out, stderr=b"")


@pytest.fixture
def fake_sas(monkeypatch):
    fake = FakeSAS()
    monkeypatch.setattr(sas, "sas_available", lambda: True)
    monkeypatch.setattr(sas, "run_sas_command", fake)
    return fake


def _event_file(tmp_path, instrume="EPN"):
    p = tmp_path / f"P0PNS003PIEVLI0.FTZ"
    write_bintable(
        p,
        {"TIME": np.array([1.0, 2.0]), "DETX": np.array([0, 1], np.int32),
         "DETY": np.array([0, 1], np.int32), "PI": np.array([600, 900], np.int32)},
        extname="EVENTS",
        header={"INSTRUME": instrume,
                "REFXCDLT": -1.38889e-5, "REFYCDLT": 1.38889e-5,
                "PA_PNT": 80.0},
    )
    return p


def _pps(tmp_path):
    ccf = tmp_path / "P0OBX000CALIND0.FTZ"
    ccf.write_bytes(b"\x00")
    return {"pps_dir": tmp_path, "ccf_file": ccf, "fbk_files": [],
            "evl_files": []}


def test_filter_events_expressions(fake_sas, tmp_path):
    evl = _event_file(tmp_path, "EPN")
    gti = tmp_path / "pn.gti"
    out = sas.filter_events_gti(evl, gti, _pps(tmp_path), tmp_path)
    assert out.exists()
    (call,) = fake_sas.calls
    expr = [a for a in call if a.startswith("expression=")][0]
    # EPN filter family (xmmsas_tools.py:437-444)
    assert "(FLAG == 0)" in expr and "(PATTERN <= 4)" in expr
    assert f"gti({gti},TIME)" in expr and "(PI>150)" in expr


def test_filter_events_mos_expressions(fake_sas, tmp_path):
    evl = _event_file(tmp_path, "EMOS1")
    out = sas.filter_events_gti(evl, tmp_path / "m1.gti", _pps(tmp_path),
                                tmp_path)
    assert out.exists()
    expr = [a for a in fake_sas.calls[0] if a.startswith("expression=")][0]
    assert "#XMMEA_EM" in expr and "(PATTERN <= 12)" in expr


def test_make_detxy_image_binning_and_wcs(fake_sas, tmp_path):
    evl = _event_file(tmp_path, "EPN")
    out = sas.make_detxy_image(evl, tmp_path, _pps(tmp_path))
    assert out.exists()
    evsel = fake_sas.calls[0]
    assert "ximagebinsize=80" in evsel and "yimagebinsize=80" in evsel
    expr = [a for a in evsel if a.startswith("expression=")][0]
    # PI band + PN image family (xmmsas_tools.py:536-539)
    assert "PI in [500:2000]" in expr and "FLAG==0" in expr
    assert fake_sas.calls[1][0] == "ecoordconv"

    img, hdr = read_image(out)
    assert img.shape == (411, 403)
    # ecoordconv numbers applied verbatim (xmmsas_tools.py:589-618)
    assert hdr["CRPIX1"] == 206.5 and hdr["CRPIX2"] == 200.5
    assert hdr["CRVAL1"] == 10.25 and hdr["CRVAL2"] == -5.5
    assert hdr["CROT2"] == pytest.approx(10.0)  # 90 - PA_PNT
    np.testing.assert_allclose(hdr["CDELT1"], 80 * 1.38889e-5, rtol=1e-9)
    assert "CD1_1" in hdr and "CD2_2" in hdr


def test_make_gti_pps_with_cap(fake_sas, tmp_path, monkeypatch):
    fbk = tmp_path / "P0PNS003FBKTSR0.FTZ"
    t = np.arange(0, 30_000, 100.0)
    write_bintable(
        fbk, {"TIME": t, "RATE": np.full_like(t, 0.2)},
        extname="RATE", header={"FLCUTTHR": 0.5},
        primary_header={"INSTRUME": "EPN"},
    )
    pps = {"pps_dir": tmp_path, "ccf_file": tmp_path, "fbk_files": [fbk],
           "evl_files": []}
    gtis = sas.make_gti_pps(pps, "pn", tmp_path / "out", max_expo=10.0)
    assert len(gtis) == 1 and gtis[0].name.endswith("_10.0ks.gti")
    # the tabgtigen command carried the PPS threshold expression
    tab = [c for c in fake_sas.calls if c[0] == "tabgtigen"]
    assert tab and any("expression=RATE<=0.5" in a for a in tab[0])
    # capped GTI: must equal cap_gti_exposure applied to the fake
    # tabgtigen intervals — NOT merely <= the uncapped total (the old
    # bound of 20 ks was vacuous: the uncapped 19 ks already satisfied it,
    # so a dropped cap would have passed)
    from xmm_superres_denoise_tpu.io.fits import read_bintable
    from xmm_superres_denoise_tpu.ops.events import GTI, cap_gti_exposure

    cols, _ = read_bintable(gtis[0], columns=["START", "STOP"],
                            extname="STDGTI")
    total = float((cols["STOP"] - cols["START"]).sum())
    # the fake tabgtigen writes (0, 4000) + (5000, 20000) — see fixture
    uncapped = GTI(np.array([0.0, 5000.0]), np.array([4000.0, 20000.0]))
    expected = cap_gti_exposure(uncapped, 10.0)
    assert total == pytest.approx(
        float((expected.stop - expected.start).sum())
    )
    assert total < float((uncapped.stop - uncapped.start).sum())


def test_get_pps_nxsa_download_and_extract(tmp_path):
    """get_pps_nxsa: downloads the NXSA AIO tar (opener injectable — no
    network), extracts <obsid>/pps/* next to w_dir, deletes the tar, and
    indexes the products; skip=True short-circuits on an existing dir."""
    import io
    import tarfile

    from xmm_superres_denoise_tpu.sas.pipeline import NXSA_AIO_URL, get_pps_nxsa

    obsid = "0200920101"
    w_dir = tmp_path / obsid
    w_dir.mkdir()

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name in ("P0OBX000CALIND0.FTZ", "P0PNS003PIEVLI0.FTZ",
                     "P0PNS003FBKTSR0.FTZ", "P0SCX000ATTTSR0.FTZ"):
            data = b"\x00" * 8
            info = tarfile.TarInfo(f"{obsid}/pps/{name}")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    payload = buf.getvalue()

    calls = []

    def opener(url):
        calls.append(url)
        return payload

    pps = get_pps_nxsa(obsid, w_dir, skip=True, opener=opener)
    assert calls == [NXSA_AIO_URL.format(obs_id=obsid)]
    assert pps["pps_dir"] == w_dir / "pps"
    assert pps["ccf_file"].name == "P0OBX000CALIND0.FTZ"
    assert [f.name for f in pps["evl_files"]] == ["P0PNS003PIEVLI0.FTZ"]
    assert [f.name for f in pps["att_files"]] == ["P0SCX000ATTTSR0.FTZ"]
    assert not (w_dir / "PPS_nxsa.tar").exists()  # tar cleaned up

    # second call with skip=True: no download
    pps2 = get_pps_nxsa(obsid, w_dir, skip=True, opener=opener)
    assert len(calls) == 1 and pps2["pps_dir"] == pps["pps_dir"]


def test_get_pps_nxsa_offline_error(tmp_path):
    """A network failure surfaces as a clear RuntimeError pointing at the
    pre-downloaded-PPS fallback, not a raw socket traceback."""
    import pytest as _pytest

    from xmm_superres_denoise_tpu.sas.pipeline import get_pps_nxsa

    def opener(url):
        raise OSError("no route to host")

    w = tmp_path / "obs"
    w.mkdir()
    with _pytest.raises(RuntimeError, match="offline|place the PPS"):
        get_pps_nxsa("0000000000", w, opener=opener)


def test_get_pps_nxsa_generic_workdir(tmp_path):
    """A w_dir NOT named after the obsid (e.g. the reference's broken
    default w_dir=cwd) extracts INSIDE w_dir and indexes
    w_dir/<obsid>/pps — products never land outside the working dir."""
    import io
    import tarfile

    from xmm_superres_denoise_tpu.sas.pipeline import get_pps_nxsa

    obsid = "0200920101"
    w_dir = tmp_path / "work"
    w_dir.mkdir()

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name in ("P0OBX000CALIND0.FTZ", "P0PNS003PIEVLI0.FTZ",
                     "P0PNS003FBKTSR0.FTZ", "P0SCX000ATTTSR0.FTZ"):
            data = b"\x00" * 8
            info = tarfile.TarInfo(f"{obsid}/pps/{name}")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    payload = buf.getvalue()

    pps = get_pps_nxsa(obsid, w_dir, skip=True, opener=lambda url: payload)
    assert pps["pps_dir"] == w_dir / obsid / "pps"
    assert not (tmp_path / obsid).exists()  # nothing outside w_dir
