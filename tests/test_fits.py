"""FITS I/O against real reference assets and write/read round-trips."""

from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.io import load_fits, read_image, write_image
from xmm_superres_denoise_tpu.io.fits import (
    _format_card,
    read_bintable,
    write_bintable,
)

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


@pytest.mark.parametrize("dtype,maxval", [
    (np.uint8, 255), (np.int16, 32_000), (np.uint16, 60_000),
    (np.int32, 2**31 - 1), (np.int64, 2**40), (np.uint32, 3_000_000_000),
    (np.float32, 1.0), (np.float64, 1.0),
])
@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_dtype_sweep(tmp_path, dtype, maxval, gz):
    """write_image/read_image preserve values exactly for every supported
    dtype — including unsigned types whose extremes would wrap if written
    at the same signed width (uint16 60000, uint32 3e9)."""
    g = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = g.uniform(-maxval, maxval, (7, 5)).astype(dtype)
    else:
        data = g.integers(0, maxval, (7, 5), endpoint=True).astype(dtype)
        data.flat[0] = maxval  # force the extreme
    path = tmp_path / ("img.fits" + (".gz" if gz else ""))
    write_image(path, data, {"EXPOSURE": 20_000.0})
    out, hdr = read_image(path)
    np.testing.assert_array_equal(out, data)
    assert hdr["EXPOSURE"] == 20_000.0


def test_read_bscale_bzero(tmp_path):
    """Scaled-integer images (BSCALE/BZERO, e.g. astropy-written uint16)
    decode to physical values."""
    raw = np.arange(12, dtype=np.int16).reshape(3, 4)
    path = write_image(tmp_path / "sc.fits", raw)
    blob = path.read_bytes()
    # splice BSCALE/BZERO cards before END (header block stays 2880-aligned)
    hdr_end = blob.index(b"END     ")
    extra = (
        "BSCALE  = " + f"{2.0:>20.14G}".ljust(70) +
        "BZERO   = " + f"{100.0:>20.14G}".ljust(70)
    ).encode("ascii")
    spliced = blob[:hdr_end] + extra + blob[hdr_end:]
    # re-pad: drop the same number of trailing header-pad spaces
    pad_start = hdr_end + len(extra) + 80
    spliced = spliced[:pad_start] + spliced[pad_start + len(extra):]
    out, hdr = read_image(spliced)
    np.testing.assert_array_equal(out, raw * 2.0 + 100.0)


def test_uint64_roundtrip_bzero_convention(tmp_path):
    """uint64 has no wider signed FITS type: values >= 2^63 must survive via
    the standard unsigned convention (BITPIX 64, BZERO = 2^63) instead of
    silently wrapping negative in int64."""
    data = np.array([[0, 5], [2**63 + 5, 2**64 - 1]], np.uint64)
    path = write_image(tmp_path / "u64.fits", data)
    out, hdr = read_image(path)
    assert hdr["BZERO"] == 2**63
    assert out.dtype.kind == "u" and out.dtype.itemsize == 8
    np.testing.assert_array_equal(out, data)


def test_read_integer_bzero_unsigned_convention(tmp_path):
    """Real XMM products encode uint16 as int16 + BZERO=32768 (integer
    cards). NumPy 2 raises OverflowError on `int16_array + 32768`, so the
    reader must take the exact unsigned-convention path."""
    u16 = np.array([[0, 49_000], [65_535, 1]], np.uint16)
    stored = (u16 ^ np.uint16(1 << 15)).view(np.int16)
    path = write_image(tmp_path / "raw.fits", stored)
    blob = path.read_bytes()
    hdr_end = blob.index(b"END     ")
    extra = _format_card("BZERO", 32768, "").encode("ascii")
    spliced = blob[:hdr_end] + extra + blob[hdr_end:]
    pad_start = hdr_end + len(extra) + 80
    spliced = spliced[:pad_start] + spliced[pad_start + len(extra):]
    out, _ = read_image(spliced)
    assert out.dtype.kind == "u"
    np.testing.assert_array_equal(out, u16)


def test_write_drops_stale_scaling_cards(tmp_path):
    """write_image receives PHYSICAL values; BSCALE/BZERO inherited from a
    source header must not be re-emitted (they would be applied a second
    time by the next reader)."""
    phys = np.array([[10, 20], [30, 40]], np.int32)
    path = write_image(
        tmp_path / "p.fits", phys,
        header={"BZERO": 32768, "BSCALE": 2, "EXPOSURE": 20_000.0},
    )
    out, hdr = read_image(path)
    np.testing.assert_array_equal(out, phys)
    assert "BZERO" not in hdr and "BSCALE" not in hdr
    assert hdr["EXPOSURE"] == 20_000.0


def test_long_string_and_commentary_cards(tmp_path):
    """Values longer than one card use the OGIP long-string convention
    (CONTINUE cards) and COMMENT/HISTORY become wrapped commentary cards —
    the old formatter silently truncated them and dropped the closing
    quote, emitting malformed cards for every product COMMENT."""
    long = (
        "XMM esr_gen model prediction. Needs to be multiplied by exposure. "
        "It's possible that the given exposure is not correctly calculated "
        "so take care."
    )
    path = write_image(
        tmp_path / "c.fits", np.ones((3, 4), np.float32),
        header={"IMG_CMT": long, "COMMENT": "x" * 200, "EXPOSURE": 20_000.0},
    )
    out, hdr = read_image(path)
    assert out.shape == (3, 4)
    assert hdr["IMG_CMT"] == long
    assert hdr["EXPOSURE"] == 20_000.0


def test_image_writer_drops_bintable_structure_cards(tmp_path):
    """An EVENTS-extension header copied into an image product must not
    carry extension-structure cards: a nonzero PCOUNT (heap size) made the
    product unreadable (data size = image + heap)."""
    evt_hdr = {
        "XTENSION": "BINTABLE", "PCOUNT": 16, "GCOUNT": 1, "TFIELDS": 3,
        "EXPOSURE": 20_000.0,
    }
    path = write_image(tmp_path / "img.fits", np.ones((3, 4), np.float32),
                       header=evt_hdr)
    out, hdr = read_image(path)  # crashed before: reshape size mismatch
    assert out.shape == (3, 4)
    for k in ("XTENSION", "PCOUNT", "GCOUNT", "TFIELDS"):
        assert k not in hdr
    assert hdr["EXPOSURE"] == 20_000.0


def test_read_header_only(tmp_path):
    """read_header returns shape/exposure info without decoding data."""
    from xmm_superres_denoise_tpu.io.fits import read_header

    path = write_image(
        tmp_path / "h.fits.gz",
        np.ones((7, 5), np.float32), {"EXPOSURE": 1_000.0},
    )
    hdr = read_header(path)
    assert (int(hdr["NAXIS2"]), int(hdr["NAXIS1"])) == (7, 5)
    assert hdr["EXPOSURE"] == 1_000.0


def test_bintable_roundtrip_all_dtypes(tmp_path):
    """write_bintable/read_bintable roundtrip every supported column type
    with exact values, TLMIN/TLMAX bounds, and extension selection."""
    n = 17
    g = np.random.default_rng(1)
    cols = {
        "F64": g.uniform(-1e9, 1e9, n),
        "F32": g.uniform(-1e3, 1e3, n).astype(np.float32),
        "I64": g.integers(-(2**40), 2**40, n).astype(np.int64),
        "I32": g.integers(-(2**31), 2**31 - 1, n).astype(np.int32),
        "I16": g.integers(-32768, 32767, n).astype(np.int16),
        "U8": g.integers(0, 255, n, endpoint=True).astype(np.uint8),
    }
    path = write_bintable(
        tmp_path / "tab.fits.gz", cols, extname="MYEXT",
        header={"ONTIME": 12345.0},
        column_limits={"I32": (-100, 100)},
    )
    out, hdr = read_bintable(path, extname="MYEXT")
    for k, v in cols.items():
        np.testing.assert_array_equal(out[k], v)
    assert hdr["ONTIME"] == 12345.0
    assert hdr["TLMIN4"] == -100 and hdr["TLMAX4"] == 100
    with pytest.raises(ValueError):
        read_bintable(path, extname="NOPE")


def test_header_quote_escaping_roundtrip(tmp_path):
    """String header values containing single quotes survive the FITS
    quote-doubling encoding."""
    hdr = {"OBJECT": "Barnard's Loop", "NOTE": "a'b''c"}
    path = write_image(tmp_path / "q.fits", np.zeros((2, 2), np.float32), hdr)
    _, out = read_image(path)
    assert out["OBJECT"] == "Barnard's Loop"
    assert out["NOTE"] == "a'b''c"


def test_multi_dim_image_roundtrip(tmp_path):
    """3-D cubes keep axis order (NAXIS reversal is symmetric)."""
    data = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    path = write_image(tmp_path / "cube.fits", data)
    out, hdr = read_image(path)
    assert out.shape == (2, 3, 4)
    np.testing.assert_array_equal(out, data)
    assert hdr["NAXIS"] == 3 and hdr["NAXIS1"] == 4 and hdr["NAXIS3"] == 2


def test_image_roundtrip_fuzz(tmp_path):
    """Property sweep: 120 seeded random images across every supported
    BITPIX dtype, shape, gzip on/off, NaN/inf payloads and long header
    strings survive write->read at FULL precision (the codec preserves
    the source dtype, reference uses astropy — data/tools.py:79-86)."""
    rng = np.random.default_rng(42)
    dtypes = [np.float32, np.float64, np.int16, np.int32,
              np.uint8, np.uint16, np.float16]
    for i in range(120):
        dt = dtypes[int(rng.integers(len(dtypes)))]
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        if np.issubdtype(dt, np.floating):
            a = rng.normal(0, 1e3, (h, w)).astype(dt)
            if rng.random() < 0.3:
                a.flat[int(rng.integers(a.size))] = np.nan
            if rng.random() < 0.2:
                a.flat[int(rng.integers(a.size))] = np.inf
        else:
            info = np.iinfo(dt)
            a = rng.integers(info.min, int(info.max) + 1, (h, w),
                             dtype=np.int64).astype(dt)
        gz = bool(rng.random() < 0.5)
        hdr = {"EXPOSURE": float(abs(rng.normal(2e4, 1e3))),
               "TESTKEY": "x" * int(rng.integers(0, 69))}
        path = tmp_path / f"f{i}{'.fits.gz' if gz else '.fits'}"
        write_image(path, a, header=hdr)
        b, _ = read_image(path)
        assert b.shape == a.shape, (i, dt, a.shape, b.shape)
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(b, np.float64), nan=-1,
                          posinf=-2, neginf=-3),
            np.nan_to_num(a.astype(np.float64), nan=-1,
                          posinf=-2, neginf=-3),
            err_msg=f"case {i}: {dt.__name__} {a.shape} gz={gz}")


def test_bintable_roundtrip_fuzz(tmp_path):
    """Property sweep: 80 seeded random bintables (1-5 columns over all
    supported TFORMs, 0-300 rows, NaNs, gzip) survive write->read
    exactly."""
    from xmm_superres_denoise_tpu.io.fits import read_bintable, write_bintable

    rng = np.random.default_rng(7)
    dts = [np.float64, np.float32, np.int64, np.int32, np.int16, np.uint8]
    for i in range(80):
        ncol, nrow = int(rng.integers(1, 6)), int(rng.integers(0, 300))
        cols = {}
        for c in range(ncol):
            dt = dts[int(rng.integers(len(dts)))]
            name = f"C{c}_{['TIME', 'DETX', 'DETY', 'PI', 'FLAG'][c % 5]}"
            if np.issubdtype(dt, np.floating):
                v = rng.normal(0, 1e8, nrow).astype(dt)
                if nrow and rng.random() < 0.2:
                    v[int(rng.integers(nrow))] = np.nan
            else:
                info = np.iinfo(dt)
                v = rng.integers(info.min, int(info.max) + 1, nrow,
                                 dtype=np.int64).astype(dt)
            cols[name] = v
        gz = bool(rng.random() < 0.4)
        path = tmp_path / f"t{i}{'.fits.gz' if gz else '.fits'}"
        write_bintable(path, cols, extname="EVENTS",
                       header={"OBS_ID": "0123456789"})
        got, _ = read_bintable(path, columns=list(cols))
        for k, v in cols.items():
            np.testing.assert_array_equal(
                np.nan_to_num(np.asarray(got[k], np.float64), nan=-1),
                np.nan_to_num(v.astype(np.float64), nan=-1),
                err_msg=f"case {i} col {k} {v.dtype} n={nrow} gz={gz}")
