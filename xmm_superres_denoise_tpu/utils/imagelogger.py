"""Epoch image logging: input/prediction/target/difference/SSIM-map panels.

Rebuild of the reference's W&B ImageLogger callback
(`/root/reference/xmm_superres_denoise/utils/imagelogger.py:17-309`), which
is disabled-and-stale in the reference (train.py:122-132, SURVEY.md §2.4).
This version works on the clean (lr, hr, weight) batch schema:

  * renders a panel per display sample: input / generated / label /
    difference / SSIM map, plasma colormap for images, seismic for the
    difference (imagelogger.py:17-23),
  * writes PNG panels to disk and exposure-multiplied FITS per image
    (imagelogger.py:204-309),
  * optionally forwards to Weights & Biases when the `wandb` package is
    importable and a run is active (import-guarded; the environment here is
    offline).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..io.wcs import write_xmm_product
from ..ops.stretch import Normalizer

log = logging.getLogger("xmmsr")


def _try_wandb():
    try:
        import wandb  # noqa: F401

        if wandb.run is not None:
            return wandb
    except Exception:
        pass
    return None


class ImageLogger:
    """Renders and persists display panels every `log_every_n_epochs`."""

    def __init__(
        self,
        out_dir: Path,
        normalizer: Normalizer,
        log_every_n_epochs: int = 1,
        lr_exp_ks: float = 20.0,
        hr_exp_ks: float = 100.0,
        write_fits: bool = True,
    ):
        self.out_dir = Path(out_dir)
        self.normalizer = normalizer
        self.every = max(1, log_every_n_epochs)
        self.lr_exp = lr_exp_ks * 1000.0
        self.hr_exp = hr_exp_ks * 1000.0
        self.write_fits = write_fits

    def should_log(self, epoch: int) -> bool:
        return epoch % self.every == 0

    def log_batch(
        self,
        epoch: int,
        lr: np.ndarray,  # (B, H, W, 1) normalized
        preds: np.ndarray,  # (B, H', W', 1) normalized
        hr: Optional[np.ndarray] = None,
        tag: str = "display",
        max_images: int = 4,
    ) -> Optional[Path]:
        if not self.should_log(epoch):
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        out = self.out_dir / f"epoch_{epoch:05d}"
        out.mkdir(parents=True, exist_ok=True)

        n = min(max_images, preds.shape[0])
        cols = ["input", "generated"]
        if hr is not None:
            cols += ["label", "difference", "ssim"]

        fig, axes = plt.subplots(
            n, len(cols), figsize=(3 * len(cols), 3 * n), squeeze=False
        )
        import jax.numpy as jnp

        for i in range(n):
            panels: Dict[str, np.ndarray] = {
                "input": lr[i, ..., 0],
                "generated": preds[i, ..., 0],
            }
            if hr is not None:
                panels["label"] = hr[i, ..., 0]
                panels["difference"] = preds[i, ..., 0] - hr[i, ..., 0]
                # per-pixel SSIM map at the reference kernel config
                smap = _ssim_map(preds[i : i + 1], hr[i : i + 1])
                panels["ssim"] = smap

            for j, name in enumerate(cols):
                img = panels[name]
                ax = axes[i][j]
                if name == "difference":
                    v = float(np.abs(img).max()) or 1.0
                    ax.imshow(img, cmap="seismic", vmin=-v, vmax=v, origin="lower")
                else:
                    ax.imshow(img, cmap="plasma", origin="lower")
                ax.set_title(name if i == 0 else "")
                ax.axis("off")

        panel_path = out / f"{tag}.png"
        fig.tight_layout()
        fig.savefig(panel_path, dpi=100)
        plt.close(fig)

        if self.write_fits:
            for i in range(n):
                den_in = np.asarray(
                    self.normalizer.denormalize_lr(lr[i, ..., 0])
                ) * self.lr_exp
                den_pred = np.asarray(
                    self.normalizer.denormalize_hr(preds[i, ..., 0])
                ) * self.hr_exp
                res_mult = den_pred.shape[0] // den_in.shape[0]
                write_xmm_product(
                    den_in, out, f"{tag}_{i}_input", 1, self.lr_exp
                )
                write_xmm_product(
                    den_pred, out, f"{tag}_{i}_generated", res_mult, self.hr_exp
                )

        wandb = _try_wandb()
        if wandb is not None:
            wandb.log({f"images/{tag}": wandb.Image(str(panel_path))}, step=epoch)

        log.info("Logged %d display images to %s", n, out)
        return panel_path


def _ssim_map(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Full-resolution SSIM map (downsampled mean map of the windows)."""
    import jax.numpy as jnp

    from ..ops.ssim import gaussian_kernel_1d, _depthwise_blur, _reflect_pad

    p = jnp.asarray(pred)
    t = jnp.asarray(target)
    taps = jnp.asarray(gaussian_kernel_1d())
    pad = 13 // 2
    pp = _reflect_pad(p, pad)
    tt = _reflect_pad(t, pad)
    mu_p = _depthwise_blur(pp, taps)
    mu_t = _depthwise_blur(tt, taps)
    s_p = _depthwise_blur(pp * pp, taps) - mu_p**2
    s_t = _depthwise_blur(tt * tt, taps) - mu_t**2
    s_pt = _depthwise_blur(pp * tt, taps) - mu_p * mu_t
    c1, c2 = 0.01**2, 0.05**2
    m = ((2 * mu_p * mu_t + c1) * (2 * s_pt + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (s_p + s_t + c2)
    )
    return np.asarray(m[0, ..., 0])
