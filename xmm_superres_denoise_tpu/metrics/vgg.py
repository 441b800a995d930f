"""VGG perceptual feature loss (reference VGGLoss, metrics/metrics.py:104-150).

The reference wraps torchvision's VGG features (first `layers+1` modules of
vgg11/13/16/19, ImageNet-normalized inputs, MSE over feature maps) but never
uses it in the training path. This rebuild provides the same surface in Flax:

  * `VGGFeatures`: the convolutional prefix of a VGG network, NHWC;
  * `VGGLoss`: grayscale->3ch repeat, ImageNet mean/std normalization,
    MSE between feature maps (metrics.py:139-150).

Pretrained ImageNet weights are not downloadable in this offline
environment; load them from an npz exported elsewhere via
`load_vgg_params_npz` (torchvision state-dict layout, OIHW->HWIO). With
random init the loss is still a valid random-projection perceptual distance
(useful for tests), but matches the reference only with pretrained weights.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray

# torchvision VGG configs: numbers = conv output channels, "M" = maxpool.
VGG_CONFIGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (
        64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
        512, 512, 512, "M", 512, 512, 512, "M",
    ),
    "vgg19": (
        64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
    ),
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _torchvision_modules(config) -> list:
    """The flat nn.Sequential module list torchvision builds: every conv is
    followed by a ReLU module (relevant for the `layers` cutoff index)."""
    mods = []
    for c in config:
        if c == "M":
            mods.append(("pool", None))
        else:
            mods.append(("conv", c))
            mods.append(("relu", None))
    return mods


class VGGFeatures(nn.Module):
    """features[: layers + 1] of a torchvision VGG, NHWC."""

    vgg_model: str = "vgg19"
    layers: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mods = _torchvision_modules(VGG_CONFIGS[self.vgg_model])[: self.layers + 1]
        conv_i = 0
        for kind, c in mods:
            if kind == "conv":
                x = nn.Conv(c, (3, 3), padding="SAME", name=f"conv_{conv_i}")(x)
                conv_i += 1
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class VGGLoss:
    """MSE between VGG feature maps of preds/target (metrics.py:139-150)."""

    def __init__(self, vgg_model: str = "vgg19", layers: int = 8, params=None,
                 seed: int = 0):
        self.net = VGGFeatures(vgg_model, layers)
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3))
            )
        self.params = params

    def _prep(self, x: Array) -> Array:
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def __call__(self, preds: Array, target: Array) -> Array:
        fp = self.net.apply(self.params, self._prep(preds))
        ft = self.net.apply(self.params, self._prep(target))
        return jnp.mean(jnp.square(fp - ft))


def load_vgg_params_npz(path: Path, vgg_model: str = "vgg19", layers: int = 8):
    """Map a torchvision VGG state dict (exported as npz: features.N.weight /
    features.N.bias, OIHW) onto the VGGFeatures pytree."""
    data = np.load(path)
    mods = _torchvision_modules(VGG_CONFIGS[vgg_model])[: layers + 1]
    params = {}
    conv_i = 0
    seq_i = 0
    for kind, _ in mods:
        if kind == "conv":
            w = data[f"features.{seq_i}.weight"]  # (O, I, kh, kw)
            b = data[f"features.{seq_i}.bias"]
            params[f"conv_{conv_i}"] = {
                "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                "bias": b,
            }
            conv_i += 1
        seq_i += 1
    return {"params": params}
