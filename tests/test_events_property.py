"""Property sweep for the native event pipeline (ops/events.py).

Seeded fuzz of the SAS-replacement semantics against independent
restatements written with different numpy idioms (or plain Python loops),
so a shared bug can't hide in both sides:

  * gti_from_rate vs a diff-of-boolean-mask interval reconstruction
    (tabgtigen `RATE<=thr` + mingtisize, xmmsas_tools.py:282-290);
  * cap_gti_exposure vs an ORDER-INSENSITIVE oracle of the largest-first
    accumulation INCLUDING the reference's overshoot quirk (max_expo_gti,
    xmmsas_tools.py:160-213): both sides inherit np.argsort's unstable
    tie order, and the quirk means capped exposure is NOT always <= the
    cap, so the oracle checks greedy-prefix/nesting/truncation invariants
    rather than one ordering;
  * bin_events (host path) vs a per-event Python-loop histogram of an
    independently recomputed selection (evselect semantics,
    xmmsas_tools.py:437-444,469-547);
  * host vs device binning agreement across GTI-table sizes (exercising
    the power-of-two GTI padding buckets) and event-padding sizes;
  * bin_events_sky vs the same loop histogram over the X/Y columns.
"""

import numpy as np

from xmm_superres_denoise_tpu.io.fits import Header
from xmm_superres_denoise_tpu.ops.events import (
    GTI,
    EventList,
    bin_events,
    bin_events_sky,
    cap_gti_exposure,
    gti_from_rate,
)

BIN = 16
# Fixed detector bounds -> fixed (ny, nx) so the jitted device kernel
# compiles once, not per sweep case.
X0, X1 = -200, 199  # nx = 400 / 16 = 25
Y0, Y1 = -120, 135  # ny = 256 / 16 = 16


def _make_events(rng, n):
    hdr = Header()
    hdr["TFIELDS"] = 4
    for i, (name, lo, hi) in enumerate(
        [("DETX", X0, X1), ("DETY", Y0, Y1), ("X", X0, X1), ("Y", Y0, Y1)],
        start=1,
    ):
        hdr[f"TTYPE{i}"] = name
        hdr[f"TLMIN{i}"] = lo
        hdr[f"TLMAX{i}"] = hi
    margin = 40  # some events out of detector bounds
    return EventList(
        time=np.sort(rng.uniform(0.0, 10_000.0, n)),
        detx=rng.integers(X0 - margin, X1 + margin, n).astype(np.int32),
        dety=rng.integers(Y0 - margin, Y1 + margin, n).astype(np.int32),
        pi=rng.integers(100, 4000, n).astype(np.int32),
        pattern=rng.integers(0, 13, n).astype(np.int32),
        flag=rng.choice(
            np.array([0, 0, 0, 1, 0x10, 0x20000], np.int32), n
        ),
        header=hdr,
        x=rng.integers(X0, X1 + 1, n).astype(np.int32),
        y=rng.integers(Y0, Y1 + 1, n).astype(np.int32),
    )


def _loop_histogram(cx, cy, nx, ny, x0, y0):
    img = np.zeros((ny, nx), np.float32)
    for px, py in zip(cx, cy):
        ix = (int(px) - x0) // BIN
        iy = (int(py) - y0) // BIN
        if 0 <= ix < nx and 0 <= iy < ny:
            img[iy, ix] += 1.0
    return img


def _loop_select(ev, gti, pi_band, pattern_max, flag_mask):
    keep = []
    for i in range(len(ev.time)):
        if not (pi_band[0] <= ev.pi[i] <= pi_band[1]):
            continue
        if (int(ev.flag[i]) & flag_mask) != 0:
            continue
        if ev.pattern[i] > pattern_max:
            continue
        if gti is not None and not any(
            s <= ev.time[i] < e for s, e in zip(gti.start, gti.stop)
        ):
            continue
        keep.append(i)
    return np.array(keep, np.int64)


def _check_capped(gti, capped, max_expo_ks):
    """Order-insensitive oracle for cap_gti_exposure / max_expo_gti.

    Both this implementation and the reference order tied GTI lengths by
    np.argsort's UNSTABLE quicksort internals (xmmsas_tools.py:198
    `delta_time.argsort()[-nrec:][::-1]`), so on tied deltas the exact
    selection is unspecified in BOTH — and rate-curve GTIs tie routinely
    (durations are multiples of the curve's dt). The oracle therefore
    verifies the semantics rather than one ordering: the kept intervals
    are SOME k-largest-deltas prefix of a greedy descending accumulation,
    exactly one interval carries the overshoot-quirk truncation, and every
    kept interval nests inside an original one.
    """
    cap = max_expo_ks * 1000.0
    deltas = gti.stop - gti.start
    starts = {float(s): i for i, s in enumerate(gti.start)}

    if np.any(deltas >= cap):
        # single-interval branches: the unique >=cap interval, or the
        # first argmax when several qualify — either way the global max
        j = int(np.argmax(deltas))
        assert len(capped.start) == 1
        np.testing.assert_allclose(
            [capped.start[0], capped.stop[0]],
            [gti.start[j], gti.start[j] + cap],
        )
        return

    top = np.sort(deltas)[::-1]
    if deltas.sum() < cap:
        # accumulation never reaches the cap: everything kept untruncated
        np.testing.assert_allclose(capped.start, gti.start)
        np.testing.assert_allclose(capped.stop, gti.stop)
        return

    k = len(capped.start)
    assert 1 <= k <= len(deltas)
    assert top[:k].sum() >= cap - 1e-9
    if k > 1:
        assert top[: k - 1].sum() < cap

    truncated = []
    sel_deltas = []
    for cs, ce in zip(capped.start, capped.stop):
        i = starts[float(cs)]  # kept intervals keep their original start
        assert ce <= gti.stop[i] + 1e-9  # nests inside the original
        sel_deltas.append(deltas[i])
        if ce < gti.stop[i] - 1e-9:
            truncated.append((i, ce))
    # the selection is a valid k-largest multiset
    np.testing.assert_allclose(np.sort(sel_deltas)[::-1], top[:k])
    # exactly one interval carries the overshoot quirk: its new length is
    # (accumulated total) - cap, measured on ORIGINAL deltas
    overshoot = float(np.sum(sel_deltas) - cap)
    assert len(truncated) == 1  # the break interval is always reassigned
    i, ce = truncated[0]
    np.testing.assert_allclose(ce - gti.start[i], overshoot, atol=1e-9)


def test_gti_property_fuzz():
    """120 seeded cases: interval reconstruction + capping replay."""
    rng = np.random.default_rng(2026)
    nonempty = 0
    for case in range(120):
        n = int(rng.integers(2, 200))
        dt = float(rng.choice([1.0, 10.0, 100.0]))
        t = np.arange(n) * dt + float(rng.uniform(0, 1e5))
        rate = rng.exponential(1.0, n)
        thr = float(rng.uniform(0.2, 2.5))
        ming = float(rng.choice([0.0, dt, 3 * dt, 10 * dt]))

        gti = gti_from_rate(t, rate, thr, mingtisize=ming)

        # independent reconstruction: pad the boolean mask and diff it
        good = np.concatenate([[False], rate <= thr, [False]])
        edges = np.flatnonzero(np.diff(good.astype(np.int8)))
        starts_i, stops_i = edges[0::2], edges[1::2] - 1
        exp_start = t[starts_i]
        exp_stop = t[stops_i] + dt
        keep = (exp_stop - exp_start) >= ming
        np.testing.assert_allclose(gti.start, exp_start[keep])
        np.testing.assert_allclose(gti.stop, exp_stop[keep])

        if len(gti.start):
            nonempty += 1
            # structural invariants
            assert np.all(gti.stop > gti.start)
            assert np.all(np.diff(gti.start) > 0)
            assert np.all(gti.start[1:] >= gti.stop[:-1])  # disjoint
            assert np.all((gti.stop - gti.start) >= ming)

            cap_ks = float(rng.uniform(0.001, 1.2) * gti.exposure / 1000.0)
            capped = cap_gti_exposure(gti, cap_ks)
            _check_capped(gti, capped, cap_ks)
    assert nonempty >= 60  # the sweep actually exercised capping


def test_binning_property_fuzz():
    """80 seeded cases: host binning vs loop oracle; periodic device check."""
    rng = np.random.default_rng(31)
    nx = (X1 - X0 + 1) // BIN
    ny = (Y1 - Y0 + 1) // BIN
    device_checked = 0
    for case in range(80):
        ev = _make_events(rng, int(rng.integers(50, 400)))
        n_gti = int(rng.integers(0, 7))
        if n_gti == 0 and rng.random() < 0.5:
            gti = None
        else:
            cuts = np.sort(rng.uniform(0.0, 10_000.0, 2 * n_gti))
            gti = GTI(cuts[0::2], cuts[1::2])
        pi_band = (int(rng.integers(100, 900)), int(rng.integers(1000, 4000)))
        pattern_max = int(rng.integers(0, 13))
        flag_mask = int(rng.choice([-1, 0x20010]))

        img, meta = bin_events(
            ev, gti, bin_size=BIN, pi_band=pi_band,
            pattern_max=pattern_max, flag_mask=flag_mask,
        )
        assert img.shape == (ny, nx)
        assert (meta["nx"], meta["ny"]) == (nx, nx * 0 + ny)

        keep = _loop_select(ev, gti, pi_band, pattern_max, flag_mask)
        oracle = _loop_histogram(
            ev.detx[keep], ev.dety[keep], nx, ny, X0, Y0
        )
        np.testing.assert_array_equal(img, oracle)

        sky, smeta = bin_events_sky(
            ev, gti, bin_size=BIN, pi_band=pi_band,
            pattern_max=pattern_max, flag_mask=flag_mask,
        )
        sky_oracle = _loop_histogram(ev.x[keep], ev.y[keep], nx, ny, X0, Y0)
        np.testing.assert_array_equal(sky, sky_oracle)
        # sky columns were drawn strictly in-bounds: total counts = |selection|
        assert sky.sum() == len(keep)

        if case % 16 == 0:
            # device kernel: same geometry every time (one compile per GTI
            # padding bucket), small pad_to to keep the CPU scatter cheap
            dev, _ = bin_events(
                ev, gti, bin_size=BIN, pi_band=pi_band,
                pattern_max=pattern_max, flag_mask=flag_mask,
                pad_to=512, device=True,
            )
            np.testing.assert_array_equal(dev, img)
            device_checked += 1
    assert device_checked == 5
