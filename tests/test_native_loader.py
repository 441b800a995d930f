"""Native C FITS decoder vs the pure-Python reader (bit-exact)."""

import zlib
from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.data.native_loader import (
    load_fits_fast,
    native_available,
    read_batch_native,
    read_image_native,
)
from xmm_superres_denoise_tpu.io.fits import load_fits, read_image, write_image

REF_MASK = Path("/root/reference/res/detector_mask/pn_mask_500_2000_detxy_1x.ds")
SIM_20KS = Path("/root/reference/data/example_data/sim/combined/20ks")

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_matches_python_synthetic(tmp_path):
    for dtype, name in [
        (np.int16, "i16.fits"),
        (np.int32, "i32.fits"),
        (np.float32, "f32.fits.gz"),
        (np.float64, "f64.fits"),
    ]:
        # not hash(name): str hashes are salted per interpreter run, making
        # any failure irreproducible on rerun
        g = np.random.default_rng(zlib.crc32(name.encode()) & 0xFFFF)
        if np.issubdtype(dtype, np.integer):
            data = g.integers(-100, 1000, (37, 53)).astype(dtype)
        else:
            data = g.normal(size=(37, 53)).astype(dtype)
        p = write_image(tmp_path / name, data)
        native = read_image_native(p)
        assert native is not None, name
        ref, _ = read_image(p)
        np.testing.assert_allclose(native, ref.astype(np.float32), rtol=1e-6)


@needs_native
@pytest.mark.skipif(not REF_MASK.exists(), reason="reference assets unavailable")
def test_native_matches_python_reference_assets():
    native = read_image_native(REF_MASK)
    ref, _ = read_image(REF_MASK)
    np.testing.assert_array_equal(native, ref.astype(np.float32))

    if SIM_20KS.exists():
        f = sorted(SIM_20KS.glob("*.fits.gz"))[0]
        native = load_fits_fast(f)
        ref = load_fits(f)
        np.testing.assert_array_equal(native, ref)


@needs_native
@pytest.mark.skipif(not SIM_20KS.exists(), reason="reference assets unavailable")
def test_native_batch_decode():
    files = sorted(SIM_20KS.glob("*.fits.gz"))[:4]
    batch = read_batch_native(files, (411, 403), n_threads=4)
    assert batch is not None and batch.shape == (len(files), 411, 403)
    for i, f in enumerate(files):
        np.testing.assert_array_equal(batch[i], load_fits(f)[0])
