"""FITS I/O against real reference assets and write/read round-trips."""

from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.io import load_fits, read_image, write_image

REF = Path("/root/reference")
MASK_1X = REF / "res/detector_mask/pn_mask_500_2000_detxy_1x.ds"
MASK_2X = REF / "res/detector_mask/pn_mask_500_2000_detxy_2x.ds"
SIM_20KS = REF / "data/example_data/sim/combined/20ks"


@pytest.mark.skipif(not MASK_1X.exists(), reason="reference assets unavailable")
def test_read_detector_mask_1x():
    img, hdr = read_image(MASK_1X)
    assert img.shape == (411, 403)
    vals = np.unique(img)
    assert set(vals.tolist()) <= {0, 1}


@pytest.mark.skipif(not MASK_2X.exists(), reason="reference assets unavailable")
def test_read_detector_mask_2x():
    img, _ = read_image(MASK_2X)
    assert img.shape == (822, 806)


@pytest.mark.skipif(not SIM_20KS.exists(), reason="reference assets unavailable")
def test_read_gzipped_sim_image():
    path = sorted(SIM_20KS.glob("*.fits.gz"))[0]
    img = load_fits(path)
    assert img.shape == (1, 411, 403)
    assert img.dtype == np.float32
    assert np.all(np.isfinite(img))
    assert img.min() >= 0


def test_write_read_roundtrip_float(tmp_path):
    data = np.random.default_rng(0).normal(size=(41, 43)).astype(np.float32)
    p = write_image(tmp_path / "x.fits", data, header={"EXPOSURE": 20000.0})
    back, hdr = read_image(p)
    np.testing.assert_array_equal(back, data)
    assert hdr["EXPOSURE"] == 20000.0


def test_write_read_roundtrip_gzip(tmp_path):
    data = (np.random.default_rng(1).poisson(3, size=(16, 16))).astype(np.int32)
    p = write_image(tmp_path / "y.fits.gz", data)
    back, _ = read_image(p)
    np.testing.assert_array_equal(back, data)


def test_header_string_and_bool(tmp_path):
    data = np.zeros((4, 4), np.float32)
    p = write_image(
        tmp_path / "h.fits", data, header={"TELESCOP": "XMM", "VIGNAPP": True}
    )
    _, hdr = read_image(p)
    assert hdr["TELESCOP"] == "XMM"
    assert hdr["VIGNAPP"] is True
