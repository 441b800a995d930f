"""Split persistence, reference split-archive loading, index expansion."""

from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.data.splits import (
    ensure_splits,
    expand_indices,
    load_splits_zip,
    random_split_indices,
)

REF_SPLITS = Path("/root/reference/res/splits")


def test_random_split_partition():
    splits = random_split_indices(100, (0.8, 0.1, 0.1), seed=0)
    allv = np.concatenate([splits[k] for k in ("train", "val", "test")])
    assert sorted(allv.tolist()) == list(range(100))
    assert len(splits["train"]) == 80


def test_random_split_remainder_distribution():
    splits = random_split_indices(11, (0.8, 0.1, 0.1), seed=1)
    total = sum(len(v) for v in splits.values())
    assert total == 11


def test_ensure_splits_persistence(tmp_path):
    s1 = ensure_splits(tmp_path, "img.p", 50, seed=3)
    s2 = ensure_splits(tmp_path, "img.p", 50, seed=999)  # reloaded, not regen
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k])
    assert (tmp_path / "train" / "img.p").exists()


def test_expand_indices_offsets():
    base = np.array([1, 3])
    out = expand_indices(base, base_count=10, multiplicity=3)
    np.testing.assert_array_equal(out, [1, 3, 11, 13, 21, 23])


@pytest.mark.skipif(not REF_SPLITS.exists(), reason="reference splits unavailable")
def test_load_reference_split_archives():
    for zip_name in ("sim_dataset.zip", "real_dataset.zip"):
        path = REF_SPLITS / zip_name
        if not path.exists():
            continue
        splits = load_splits_zip(path)
        assert splits, zip_name
        for name, arr in splits.items():
            assert arr.ndim == 1 and arr.dtype.kind in "iu", name
            assert len(arr) > 0
