"""Native C bintable reader vs the pure-Python one (exactness + fallback).

The native path (native/fits_reader.cc: xmmsr_bt_*) must be a value-exact,
header-exact replacement for io.fits.read_bintable on the column subset it
serves, and must step aside (None) whenever it cannot serve a file.
"""

from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.data.native_loader import native_available
from xmm_superres_denoise_tpu.io.fits import read_bintable, write_bintable
from xmm_superres_denoise_tpu.io.native_bintable import (
    read_bintable_fast,
    read_bintable_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native FITS library unavailable"
)

COLS = ["TIME", "DETX", "DETY", "PI", "PATTERN", "FLAG", "X", "Y"]


def _mixed_table(path: Path) -> Path:
    g = np.random.default_rng(7)
    n = 4321
    return write_bintable(
        path,
        {
            "TIME": np.sort(g.uniform(5.6e8, 5.6e8 + 3e4, n)),  # f8
            "DETX": g.integers(-16120, 16120, n).astype(np.int16),  # i2
            "DETY": g.integers(-16440, 16440, n).astype(np.int32),  # i4
            "PI": g.integers(150, 12000, n).astype(np.int64),  # i8
            "PATTERN": g.integers(0, 13, n).astype(np.uint8),  # u1
            "FLAG": g.normal(size=n).astype(np.float32),  # f4
        },
        extname="EVENTS",
        header={"INSTRUME": "EPN", "ONTIME": 30000.0},
        column_limits={"DETX": (-16120, 16119), "DETY": (-16440, 16439)},
    )


@pytest.mark.parametrize("suffix", ["ev.fits", "ev.fits.gz"])
def test_native_matches_python_exactly(tmp_path, suffix):
    path = _mixed_table(tmp_path / suffix)
    cols_p, hdr_p = read_bintable(path, columns=COLS, extname="EVENTS")
    res = read_bintable_native(path, COLS, extname="EVENTS")
    assert res is not None
    cols_n, hdr_n = res
    assert sorted(cols_n) == sorted(cols_p)  # X/Y absent from both
    for k in cols_p:
        assert cols_n[k].dtype == cols_p[k].dtype.newbyteorder("=")
        assert np.array_equal(np.asarray(cols_p[k]), cols_n[k]), k
    for key in ("TFIELDS", "NAXIS1", "NAXIS2", "INSTRUME", "ONTIME",
                "TLMIN2", "TLMAX2", "TLMIN3", "TLMAX3", "EXTNAME"):
        assert hdr_n.get(key) == hdr_p.get(key), key


def test_extname_selection(tmp_path):
    """Two bintables in one file: the native walker must skip past the
    first HDU's data to the named extension."""
    import gzip

    a = _mixed_table(tmp_path / "a.fits").read_bytes()
    t = np.arange(0.0, 300.0)
    b = write_bintable(
        tmp_path / "b.fits",
        {"TIME": t, "RATE": np.full_like(t, 0.25)},
        extname="RATE",
        header={"FLCUTTHR": 0.5},
    ).read_bytes()
    # concatenate: primary+EVENTS then the RATE extension HDU of b
    # (skip b's primary HDU: one header block, no data)
    both = tmp_path / "both.fits"
    both.write_bytes(a + b[2880:])

    res = read_bintable_native(both, ["TIME", "RATE"], extname="RATE")
    assert res is not None
    cols, hdr = res
    assert hdr["EXTNAME"] == "RATE" and hdr.get("FLCUTTHR") == 0.5
    assert np.array_equal(cols["RATE"], np.full_like(t, 0.25))
    # and the first table is still reachable by its own name
    res2 = read_bintable_native(both, ["DETX"], extname="EVENTS")
    assert res2 is not None and len(res2[0]["DETX"]) == 4321


def test_vector_column_repeat(tmp_path):
    """TFORM '3J' vector columns come back as (nrows, repeat), matching the
    Python reader."""
    nrows, rep = 57, 3
    vals = np.arange(nrows * rep, dtype=">i4").reshape(nrows, rep)
    rowlen = 4 * rep
    cards = []

    def card(k, v):
        if isinstance(v, str):
            return f"{k:<8}= '{v}'".ljust(80)
        if isinstance(v, bool):
            return f"{k:<8}= {'T' if v else 'F':>20}".ljust(80)
        return f"{k:<8}= {v:>20}".ljust(80)

    primary = (card("SIMPLE", True) + card("BITPIX", 8)
               + card("NAXIS", 0) + card("EXTEND", True) + "END".ljust(80))
    primary = primary.ljust(2880).encode()
    table = (card("XTENSION", "BINTABLE") + card("BITPIX", 8)
             + card("NAXIS", 2) + card("NAXIS1", rowlen)
             + card("NAXIS2", nrows) + card("PCOUNT", 0)
             + card("GCOUNT", 1) + card("TFIELDS", 1)
             + card("TTYPE1", "V") + card("TFORM1", "3J")
             + card("EXTNAME", "VEC") + "END".ljust(80))
    table = table.ljust(2880).encode()
    data = vals.tobytes()
    data += b"\x00" * (-len(data) % 2880)
    path = tmp_path / "vec.fits"
    path.write_bytes(primary + table + data)

    cols_p, _ = read_bintable(path, columns=["V"], extname="VEC")
    res = read_bintable_native(path, ["V"], extname="VEC")
    assert res is not None
    assert res[0]["V"].shape == (nrows, rep)
    assert np.array_equal(res[0]["V"], np.asarray(cols_p["V"]))
    assert np.array_equal(res[0]["V"], vals.astype(np.int32))


def test_char_column_matches_python(tmp_path):
    """TFORM '4A' character columns come back as S4 strings of shape
    (nrows,), exactly like the pure-Python reader — not raw uint8 bytes."""
    nrows, rep = 11, 4
    vals = np.array([f"M{i:02d}".ljust(rep).encode() for i in range(nrows)],
                    dtype=f"S{rep}")
    ids = np.arange(nrows, dtype=">i4")
    rowlen = rep + 4
    cards = []

    def card(k, v):
        if isinstance(v, str):
            return f"{k:<8}= '{v}'".ljust(80)
        if isinstance(v, bool):
            return f"{k:<8}= {'T' if v else 'F':>20}".ljust(80)
        return f"{k:<8}= {v:>20}".ljust(80)

    primary = (card("SIMPLE", True) + card("BITPIX", 8)
               + card("NAXIS", 0) + card("EXTEND", True) + "END".ljust(80))
    primary = primary.ljust(2880).encode()
    table = (card("XTENSION", "BINTABLE") + card("BITPIX", 8)
             + card("NAXIS", 2) + card("NAXIS1", rowlen)
             + card("NAXIS2", nrows) + card("PCOUNT", 0)
             + card("GCOUNT", 1) + card("TFIELDS", 2)
             + card("TTYPE1", "MODE") + card("TFORM1", f"{rep}A")
             + card("TTYPE2", "ID") + card("TFORM2", "1J")
             + card("EXTNAME", "CHARS") + "END".ljust(80))
    table = table.ljust(2880).encode()
    rows = bytearray()
    for i in range(nrows):
        rows += vals[i] + ids[i : i + 1].tobytes()
    data = bytes(rows) + b"\x00" * (-len(rows) % 2880)
    path = tmp_path / "chars.fits"
    path.write_bytes(primary + table + data)

    cols_p, _ = read_bintable(path, columns=["MODE", "ID"], extname="CHARS")
    res = read_bintable_native(path, ["MODE", "ID"], extname="CHARS")
    assert res is not None
    cols_n = res[0]
    assert cols_n["MODE"].dtype == np.dtype(f"S{rep}")
    assert cols_n["MODE"].shape == (nrows,)
    assert np.array_equal(cols_n["MODE"], np.asarray(cols_p["MODE"]))
    assert np.array_equal(cols_n["MODE"], vals)
    assert np.array_equal(cols_n["ID"], np.arange(nrows, dtype=np.int32))


def test_missing_column_omitted(tmp_path):
    path = _mixed_table(tmp_path / "ev.fits")
    res = read_bintable_native(path, ["TIME", "NOSUCH"], extname="EVENTS")
    assert res is not None
    assert sorted(res[0]) == ["TIME"]


def test_absent_extension_returns_none(tmp_path):
    path = _mixed_table(tmp_path / "ev.fits")
    assert read_bintable_native(path, ["TIME"], extname="NOPE") is None
    assert read_bintable_native(tmp_path / "missing.fits", ["TIME"]) is None


def test_fast_wrapper_falls_back(tmp_path, monkeypatch):
    """read_bintable_fast must serve identical results when the native
    path is knocked out."""
    path = _mixed_table(tmp_path / "ev.fits")
    native = read_bintable_fast(path, COLS, extname="EVENTS")
    monkeypatch.setattr(
        "xmm_superres_denoise_tpu.io.native_bintable.read_bintable_native",
        lambda *a, **k: None,
    )
    fallback = read_bintable_fast(path, COLS, extname="EVENTS")
    assert sorted(native[0]) == sorted(fallback[0])
    for k in native[0]:
        assert np.array_equal(
            np.asarray(native[0][k]), np.asarray(fallback[0][k])
        )


def test_event_pipeline_native_equals_python(tmp_path):
    """End to end: load_event_list (native-backed) -> bin_events matches a
    pipeline forced through the pure-Python reader."""
    from xmm_superres_denoise_tpu.ops import events as ev

    g = np.random.default_rng(11)
    n = 100_000
    x0, x1, y0, y1 = -16120, 16119, -16440, 16439
    path = write_bintable(
        tmp_path / "P000PNS003PIEVLI0000.FTZ",
        {
            "TIME": np.sort(g.uniform(5.6e8, 5.6e8 + 3e4, n)),
            "DETX": g.integers(x0, x1 + 1, n).astype(np.int16),
            "DETY": g.integers(y0, y1 + 1, n).astype(np.int16),
            "PI": g.integers(150, 12_000, n).astype(np.int32),
            "PATTERN": g.integers(0, 13, n).astype(np.uint8),
            "FLAG": np.zeros(n, np.int32),
        },
        extname="EVENTS",
        header={"INSTRUME": "EPN", "ONTIME": 30_000.0},
        column_limits={"DETX": (x0, x1), "DETY": (y0, y1)},
    )
    ev_native = ev.load_event_list(path)
    img_n, meta_n = ev.bin_events(ev_native)

    import xmm_superres_denoise_tpu.ops.events as evmod

    orig = evmod.read_bintable_fast
    try:
        evmod.read_bintable_fast = (
            lambda p, columns, extname=None: read_bintable(
                p, columns=columns, extname=extname
            )
        )
        ev_python = ev.load_event_list(path)
    finally:
        evmod.read_bintable_fast = orig
    img_p, meta_p = ev.bin_events(ev_python)
    assert np.array_equal(img_n, img_p)
    exp_n, exp_p = meta_n.pop("exposure"), meta_p.pop("exposure")
    assert (exp_n == exp_p) or (np.isnan(exp_n) and np.isnan(exp_p))
    assert meta_n == meta_p
