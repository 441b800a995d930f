"""Native event pipeline: GTI derivation, exposure capping, detxy binning."""

import numpy as np
import pytest

from xmm_superres_denoise_tpu.io.fits import read_bintable, write_bintable
from xmm_superres_denoise_tpu.ops.events import (
    GTI,
    bin_events,
    cap_gti_exposure,
    detxy_image_from_event_file,
    gti_from_rate,
    load_event_list,
)


def test_gti_from_rate_basic():
    t = np.arange(0, 1000, 10.0)
    rate = np.full_like(t, 0.2)
    rate[30:40] = 5.0  # flare from t=300 to t=400
    gti = gti_from_rate(t, rate, threshold=0.5)
    assert len(gti.start) == 2
    np.testing.assert_allclose(gti.start, [0.0, 400.0])
    np.testing.assert_allclose(gti.stop, [300.0, 1000.0])
    assert gti.exposure == 900.0


def test_gti_mingtisize_drops_short_runs():
    t = np.arange(0, 200, 10.0)
    rate = np.full_like(t, 5.0)
    rate[5:8] = 0.1  # 30 s clean window < 50 s minimum
    gti = gti_from_rate(t, rate, threshold=0.5, mingtisize=50.0)
    assert len(gti.start) == 0


def test_cap_gti_single_large():
    gti = GTI(np.array([0.0]), np.array([50_000.0]))
    capped = cap_gti_exposure(gti, 20.0)
    assert capped.exposure == 20_000.0


def test_cap_gti_accumulate_preserves_reference_quirk():
    # Three GTIs of 9 ks, 8 ks, 5 ks; cap at 20 ks. Largest-first: 9+8=17,
    # then adding 5 reaches 22 >= 20 -> last GTI stop = start + (22-20)=2 ks
    # (the reference's overshoot quirk). Total = 9+8+2 = 19 ks.
    gti = GTI(
        np.array([0.0, 20_000.0, 40_000.0]),
        np.array([9_000.0, 28_000.0, 45_000.0]),
    )
    capped = cap_gti_exposure(gti, 20.0)
    assert len(capped.start) == 3
    np.testing.assert_allclose(capped.exposure, 19_000.0)


def _write_synthetic_events(path, n=5000, seed=0):
    g = np.random.default_rng(seed)
    # EPN-like detector bounds at bin 80 -> 403 x 411 image
    x0, x1 = -16120, 16119  # 32240 / 80 = 403
    y0, y1 = -16440, 16439  # 32880 / 80 = 411
    cols = {
        "TIME": np.sort(g.uniform(0, 30_000, n)),
        "DETX": g.integers(x0, x1 + 1, n).astype(np.int32),
        "DETY": g.integers(y0, y1 + 1, n).astype(np.int32),
        "PI": g.integers(150, 12_000, n).astype(np.int32),
        "PATTERN": g.integers(0, 13, n).astype(np.int32),
        "FLAG": (g.random(n) < 0.1).astype(np.int32),
    }
    write_bintable(
        path,
        cols,
        extname="EVENTS",
        header={"INSTRUME": "EPN", "ONTIME": 30_000.0},
        column_limits={"DETX": (x0, x1), "DETY": (y0, y1)},
    )
    return cols, (x0, x1, y0, y1)


def test_bin_events_geometry_and_filters(tmp_path):
    path = tmp_path / "events.fits"
    cols, (x0, x1, y0, y1) = _write_synthetic_events(path)
    events = load_event_list(path)
    assert events.detx_bounds == (x0, x1)

    img, meta = bin_events(events, gti=None)
    assert img.shape == (411, 403)

    sel = (
        (cols["PI"] >= 500)
        & (cols["PI"] <= 2000)
        & (cols["FLAG"] == 0)
        & (cols["PATTERN"] <= 4)
    )
    assert img.sum() == sel.sum()

    # spot-check one event's pixel
    i = int(np.flatnonzero(sel)[0])
    ix = (cols["DETX"][i] - x0) // 80
    iy = (cols["DETY"][i] - y0) // 80
    assert img[iy, ix] >= 1


def test_bin_events_respects_gti(tmp_path):
    path = tmp_path / "events.fits"
    cols, _ = _write_synthetic_events(path, seed=1)
    events = load_event_list(path)
    gti = GTI(np.array([0.0]), np.array([10_000.0]))
    img, meta = bin_events(events, gti)
    sel = (
        (cols["PI"] >= 500)
        & (cols["PI"] <= 2000)
        & (cols["FLAG"] == 0)
        & (cols["PATTERN"] <= 4)
        & (cols["TIME"] < 10_000.0)
    )
    assert img.sum() == sel.sum()
    assert meta["exposure"] == 10_000.0


def test_end_to_end_event_file_with_fbk(tmp_path):
    ev_path = tmp_path / "pn_events.fits"
    _write_synthetic_events(ev_path, seed=2)
    # flaring background: clean except a flare at 10-15 ks
    t = np.arange(0, 30_000, 100.0)
    rate = np.full_like(t, 0.2)
    rate[(t >= 10_000) & (t < 15_000)] = 9.0
    fbk_path = tmp_path / "pn_fbk.fits"
    write_bintable(
        fbk_path,
        {"TIME": t, "RATE": rate},
        extname="RATE",
        header={"FLCUTTHR": 0.5},
        primary_header={"INSTRUME": "EPN", "OBS_ID": "0000000000"},
    )
    img, meta, hdr = detxy_image_from_event_file(ev_path, fbk_path, max_expo_ks=20.0)
    assert img.shape == (411, 403)
    assert 0 < meta["exposure"] <= 20_000.0
    assert hdr["INSTRUME"].strip() == "EPN"


def test_bin_events_empty_gti_selects_nothing(tmp_path):
    """An EMPTY GTI table keeps zero events (SAS evselect semantics) —
    distinct from gti=None which means no time filtering. Host and device
    paths must agree on this."""
    path = tmp_path / "events.fits"
    _write_synthetic_events(path, seed=3)
    events = load_event_list(path)
    empty = GTI(np.array([], dtype=float), np.array([], dtype=float))

    host, meta = bin_events(events, empty, device=False)
    assert host.sum() == 0
    assert meta["exposure"] == 0.0

    dev, _ = bin_events(events, empty, device=True)
    np.testing.assert_array_equal(host, dev)

    # gti=None keeps everything band/quality-selected
    unfiltered, _ = bin_events(events, gti=None)
    assert unfiltered.sum() > 0


def test_device_and_host_binning_agree(tmp_path):
    path = tmp_path / "events.fits"
    cols, _ = _write_synthetic_events(path, seed=7)
    events = load_event_list(path)
    gti = GTI(np.array([2_000.0]), np.array([25_000.0]))
    host, _ = bin_events(events, gti, device=False)
    dev, _ = bin_events(events, gti, device=True)
    np.testing.assert_array_equal(host, dev)


def test_device_binning_exact_at_mission_times(tmp_path):
    """Device path must match the host path at REAL XMM mission elapsed
    times (~5.6e8 s), where the float32 ulp is 64 s: without host-side
    time rebasing, events within ~64 s of a GTI edge were misclassified
    (regression). Events are placed 1 s on either side of the edges."""
    t0 = 5.6e8
    g = np.random.default_rng(11)
    n = 512
    times = np.sort(g.uniform(t0, t0 + 30_000, n))
    # cluster events 1 s around the GTI boundaries (f32 cannot resolve)
    times[:64] = t0 + 2_000.0 - 1.0
    times[64:128] = t0 + 2_000.0 + 1.0
    times[128:192] = t0 + 25_000.0 - 1.0
    times[192:256] = t0 + 25_000.0 + 1.0
    x0b, x1b = -16120, 16119
    y0b, y1b = -16440, 16439
    cols = {
        "TIME": np.sort(times),
        "DETX": g.integers(x0b, x1b + 1, n).astype(np.int32),
        "DETY": g.integers(y0b, y1b + 1, n).astype(np.int32),
        "PI": np.full(n, 1_000, np.int32),
        "PATTERN": np.zeros(n, np.int32),
        "FLAG": np.zeros(n, np.int32),
    }
    path = tmp_path / "events.fits"
    write_bintable(
        path, cols, extname="EVENTS",
        header={"INSTRUME": "EPN", "ONTIME": 30_000.0},
        column_limits={"DETX": (x0b, x1b), "DETY": (y0b, y1b)},
    )
    events = load_event_list(path)
    gti = GTI(np.array([t0 + 2_000.0]), np.array([t0 + 25_000.0]))
    host, _ = bin_events(events, gti, device=False)
    dev, _ = bin_events(events, gti, device=True)
    assert host.sum() > 0
    np.testing.assert_array_equal(host, dev)


def test_mos_filter_family(tmp_path):
    """EMOS events bin with the MOS quality cuts — (FLAG & 0x766ba000)==0 &&
    PATTERN<=12 (xmmsas_tools.py:437-444,536-539) — selected from the event
    header's INSTRUME, and differ from the PN cuts on the same data."""
    from xmm_superres_denoise_tpu.ops.events import (
        detxy_image_from_event_file,
        instrument_filter,
    )

    g = np.random.default_rng(7)
    n = 6000
    x0, x1, y0, y1 = -16120, 16119, -16440, 16439
    # FLAG values exercising the mask: 0 (clean); 0x1/0x10 OUTSIDE the MOS
    # mask (MOS keeps, PN rejects); the mask's lowest set bit (both reject).
    flags = g.choice(
        np.array([0, 0x1, 0x10, 0x766BA000 & -0x766BA000], np.int64), n
    ).astype(np.int32)
    cols = {
        "TIME": np.sort(g.uniform(0, 30_000, n)),
        "DETX": g.integers(x0, x1 + 1, n).astype(np.int32),
        "DETY": g.integers(y0, y1 + 1, n).astype(np.int32),
        "PI": g.integers(150, 12_000, n).astype(np.int32),
        "PATTERN": g.integers(0, 26, n).astype(np.int32),
        "FLAG": flags,
    }
    path = tmp_path / "mos_events.fits"
    write_bintable(
        path, cols, extname="EVENTS",
        header={"INSTRUME": "EMOS1", "ONTIME": 30_000.0},
        column_limits={"DETX": (x0, x1), "DETY": (y0, y1)},
    )

    img, meta, hdr = detxy_image_from_event_file(path)
    # independent restatement of the MOS evselect expression
    sel_mos = (
        (cols["PI"] >= 500)
        & (cols["PI"] <= 2000)
        & ((cols["FLAG"] & 0x766BA000) == 0)
        & (cols["PATTERN"] <= 12)
    )
    assert img.sum() == sel_mos.sum()

    # PN cuts on the same data give a different count (mask + pattern window)
    sel_pn = (
        (cols["PI"] >= 500)
        & (cols["PI"] <= 2000)
        & (cols["FLAG"] == 0)
        & (cols["PATTERN"] <= 4)
    )
    assert sel_pn.sum() != sel_mos.sum()
    img_pn, _, _ = detxy_image_from_event_file(path, instrument="pn")
    assert img_pn.sum() == sel_pn.sum()

    # alias resolution
    assert instrument_filter("m2")["pattern_max"] == 12
    assert instrument_filter("EPN")["flag_mask"] == -1
    import pytest as _p
    with _p.raises(ValueError, match="Unknown EPIC instrument"):
        instrument_filter("rgs")
