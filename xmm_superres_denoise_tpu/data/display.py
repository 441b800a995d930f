"""Display data module: fixed curated batches for epoch image logging.

The reference's `XmmDisplayDataModule`
(`/root/reference/xmm_superres_denoise/data/xmm_display_datamodule.py:8-78`)
is broken in-tree (imports a removed `XmmSimDataset`, SURVEY.md §2.4); this
is the working rebuild: a deterministic, fixed selection of validation
samples rendered identically every epoch so panels are comparable across
training.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .datamodule import XmmDataModule


class XmmDisplayDataModule:
    """Wraps a parent datamodule and pins a fixed display batch."""

    def __init__(
        self,
        datamodule: XmmDataModule,
        split: str = "val",
        num_images: int = 4,
        indices: Optional[List[int]] = None,
    ):
        self.dm = datamodule
        if indices is None:
            pool = datamodule.split_indices(split)
            indices = list(map(int, pool[: num_images]))
        self.indices = indices

    _cached: Optional[Dict[str, np.ndarray]] = None

    def display_batch(self) -> Dict[str, np.ndarray]:
        """Raw host batch of the pinned samples, NHWC (un-normalized for raw
        geometry datasets; the caller runs the datamodule's device prep).

        Loaded ONCE and cached: XmmDataset composites draw random AGN/
        background picks from the dataset's shared rng, so re-sampling per
        epoch would both render different composites (panels would not be
        comparable across training) and perturb the training sample
        sequence. The one-time load uses a private rng for the same reason."""
        if self._cached is not None:
            return self._cached
        ds_rng = getattr(self.dm.dataset, "rng", None)
        if ds_rng is not None:
            self.dm.dataset.rng = np.random.default_rng(1234)
        try:
            lrs, hrs = [], []
            for i in self.indices:
                lr, hr = self.dm.dataset[int(i)]
                lrs.append(lr.transpose(1, 2, 0))
                if hr is not None:
                    hrs.append(hr.transpose(1, 2, 0))
        finally:
            if ds_rng is not None:
                self.dm.dataset.rng = ds_rng
        out = {"lr": np.stack(lrs)}
        if hrs:
            out["hr"] = np.stack(hrs)
        self._cached = out
        return out

    def prepared_batch(self):
        """Device-preprocessed (normalized, padded) display batch."""
        hb = self.display_batch()
        lr, hr = self.dm._prep(hb["lr"], hb.get("hr"))
        return {"lr": np.asarray(lr), "hr": None if hr is None else np.asarray(hr)}
