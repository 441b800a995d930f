"""Data module: dataset + splits + host-prefetched, device-preprocessed batches.

Replaces the reference's Lightning DataModule + torch DataLoader stack
(`/root/reference/xmm_superres_denoise/data/datamodule.py:14-187`) with a
TPU-first feed:

  * host side: index shuffling, FITS decode + composite (threaded prefetch —
    the stand-in for 12 DataLoader workers, datamodule.py:19-20),
  * device side: ONE jitted fused preprocess per batch (mask -> pad ->
    clamp/stretch), batch sharded over the mesh `data` axis before compute so
    each chip only touches its slice.

Split layout matches the reference (`res/splits/...`, sim 0.8/0.1/0.1 of base
names, real 0.7/0.15/0.15 per exposure) with the corrected offset-based index
expansion (SURVEY.md §2.4).
"""

from __future__ import annotations

import queue
import threading
import zlib
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import DatasetCfg, DatasetType
from ..ops.preprocess import pad_to_res, upsample_nearest
from ..ops.stretch import Normalizer, normalize
from ..parallel.mesh import batch_sharding, pad_batch_to_devices
from .datasets import BoringDataset, XmmDataset, load_det_mask
from .splits import REAL_FRACTIONS, SIM_FRACTIONS, ensure_splits, expand_indices

Batch = Dict[str, jnp.ndarray]


class XmmDataModule:
    def __init__(
        self,
        config: DatasetCfg,
        splits_root: Path = Path("res/splits"),
        seed: int = 0,
        prefetch: int = 2,
        boring_size: int = 10000,
    ):
        self.config = config
        self.seed = seed
        self.prefetch = prefetch
        self.normalizer = Normalizer(
            lr_max=config.lr.clamp_max,
            hr_max=config.hr.clamp_max if config.hr else config.lr.clamp_max,
            mode=config.scaling,
        )

        self.lr_mask = load_det_mask(config.lr.det_mask)
        self.hr_mask = load_det_mask(config.hr.det_mask) if config.hr else None

        if config.type is DatasetType.BORING:
            self.dataset = BoringDataset(
                lr_exps=list(config.lr.exps),
                hr_exp=config.hr.exp if config.hr else 100,
                hr_res_mult=config.res_mult,
                lr_res=config.lr.res,
                dataset_size=boring_size,
                seed=seed,
            )
            n = len(self.dataset)
            from .splits import random_split_indices

            self._splits = random_split_indices(n, SIM_FRACTIONS, seed)
        else:
            self.dataset = XmmDataset(
                config, comb_hr_img=config.comb_hr, rng=np.random.default_rng(seed)
            )
            n_base = self.dataset.catalog.base_name_count
            fracs = (
                SIM_FRACTIONS if config.type is DatasetType.SIM else REAL_FRACTIONS
            )
            leaf = (
                f"{config.mode}.p"
                if config.type is DatasetType.SIM
                else f"{config.lr.exps[0]}ks.p"
            )
            base_splits = ensure_splits(
                splits_root / config.name, leaf, n_base, fracs, seed
            )
            mult = len(self.dataset) // n_base
            self._splits = {
                name: expand_indices(idx, n_base, mult)
                for name, idx in base_splits.items()
            }

        self._prep = self._build_prep()

    # ------------------------------------------------------------------ #

    def _build_prep(self):
        cfg = self.config
        if cfg.type is DatasetType.BORING:

            @jax.jit
            def prep(lr_raw, hr_raw):
                # Boring pairs are already model-res pseudo-normalized randn
                # (reference dataset.py:71-74 feeds them straight through).
                return lr_raw, hr_raw

            return prep

        lr_mask = jnp.asarray(self.lr_mask) if self.lr_mask is not None else None
        hr_mask = jnp.asarray(self.hr_mask) if self.hr_mask is not None else None
        lr_res, lr_max = cfg.lr.res, cfg.lr.clamp_max
        hr_res = cfg.hr.res if cfg.hr else None
        hr_max = cfg.hr.clamp_max if cfg.hr else None
        mode = cfg.scaling
        hr_scale = (
            getattr(self.dataset, "upsample_scale", 1)
            if cfg.type is DatasetType.REAL
            else 1
        )

        @jax.jit
        def prep(lr_raw, hr_raw):
            # lr_raw: (B, H, W, 1) native geometry
            lr = lr_raw
            if lr_mask is not None:
                lr = lr * lr_mask[..., None]
            lr = pad_to_res(lr.transpose(0, 3, 1, 2), lr_res).transpose(0, 2, 3, 1)
            lr = normalize(lr, lr_max, mode)
            hr = None
            if hr_raw is not None:
                hr = hr_raw
                if hr_mask is not None:
                    hr = hr * hr_mask[..., None]
                hr = hr.transpose(0, 3, 1, 2)
                if hr_scale != 1:
                    hr = upsample_nearest(hr, hr_scale)
                hr = pad_to_res(hr, hr_res).transpose(0, 2, 3, 1)
                hr = normalize(hr, hr_max, mode)
            return lr, hr

        return prep

    # ------------------------------------------------------------------ #

    def split_indices(self, split: str) -> np.ndarray:
        return self._splits[split]

    def _host_batches(
        self, split: str, batch_size: int, shuffle: bool, rng: np.random.Generator
    ) -> Iterator[Dict[str, np.ndarray]]:
        indices = np.array(self._splits[split])
        if shuffle:
            rng.shuffle(indices)
        for start in range(0, len(indices), batch_size):
            chunk = indices[start : start + batch_size]
            lrs, hrs = [], []
            for i in chunk:
                lr, hr = self.dataset[int(i)]
                lrs.append(lr.transpose(1, 2, 0))  # CHW -> HWC
                if hr is not None:
                    hrs.append(hr.transpose(1, 2, 0))
            batch = {"lr": np.stack(lrs)}
            if hrs:
                batch["hr"] = np.stack(hrs)
            yield batch

    def loader(
        self,
        split: str,
        mesh=None,
        batch_size: Optional[int] = None,
        shuffle: Optional[bool] = None,
        epoch: int = 0,
    ) -> Iterator[Batch]:
        """Yield device-ready batches: {"lr", "hr", "weight"} NHWC, normalized,
        sharded over the mesh data axis, with threaded host prefetch."""
        batch_size = batch_size or self.config.batch_size
        if shuffle is None:
            shuffle = split == "train"
        # NOT hash(split): str hashes are salted per interpreter run
        # (PYTHONHASHSEED), which would make the shuffle irreproducible and,
        # worse, give each HOST of a multi-host run a different permutation.
        split_token = zlib.crc32(split.encode("utf-8")) & 0xFFFF
        rng = np.random.default_rng((self.seed, epoch, split_token))
        from ..parallel.mesh import DATA_AXIS

        n_shards = int(mesh.shape[DATA_AXIS]) if mesh is not None else 1

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        abandoned = threading.Event()

        def producer():
            try:
                for hb in self._host_batches(split, batch_size, shuffle, rng):
                    # bounded put + shutdown flag: if the consumer abandons
                    # the generator mid-epoch (exception in the train step),
                    # a plain q.put would park this thread forever on the
                    # full queue, stranding it plus `prefetch` decoded
                    # batches per fit attempt.
                    while not abandoned.is_set():
                        try:
                            q.put(hb, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
            finally:
                while not abandoned.is_set():
                    try:
                        q.put(_SENTINEL, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        sharding = batch_sharding(mesh) if mesh is not None else None
        try:
            while True:
                hb = q.get()
                if hb is _SENTINEL:
                    break
                hb, valid = pad_batch_to_devices(hb, n_shards)
                b = hb["lr"].shape[0]
                weight = (np.arange(b) < valid).astype(np.float32)
                dev = {"lr": hb["lr"], "weight": weight}
                if "hr" in hb:
                    dev["hr"] = hb["hr"]
                if sharding is not None:
                    dev = {
                        k: jax.device_put(v, sharding) for k, v in dev.items()
                    }
                lr, hr = self._prep(dev["lr"], dev.get("hr"))
                out = {"lr": lr, "weight": jnp.asarray(dev["weight"])}
                out["hr"] = hr if hr is not None else lr
                yield out
        finally:
            abandoned.set()
