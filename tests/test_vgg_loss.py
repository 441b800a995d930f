"""VGGLoss parity vs torch (reference metrics/metrics.py:104-150).

torchvision is absent here, so the torch side builds the identical
`features` Sequential prefix torchvision constructs (Conv2d/ReLU/MaxPool2d
per the published configs, same `features.N.*` state-dict keys) with RANDOM
weights, exports through scripts/export_vgg_npz.py's converter, and loads it
into the Flax VGGFeatures. Exactness here proves the npz loader + NHWC
orientation + `layers+1` cutoff are right, so the real pretrained
torchvision weights work on drop-in (ROADMAP: 'one file-drop away').
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from xmm_superres_denoise_tpu.metrics.vgg import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_STD,
    VGG_CONFIGS,
    VGGFeatures,
    VGGLoss,
    load_vgg_params_npz,
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from export_vgg_npz import state_dict_to_npz_arrays  # noqa: E402


def _torch_features(config, seed=0):
    """The flat nn.Sequential torchvision's make_layers builds (batch_norm
    off): every conv followed by ReLU, 'M' -> MaxPool2d(2, 2)."""
    torch.manual_seed(seed)
    mods, in_c = [], 3
    for c in config:
        if c == "M":
            mods.append(torch.nn.MaxPool2d(2, 2))
        else:
            mods.append(torch.nn.Conv2d(in_c, c, 3, padding=1))
            mods.append(torch.nn.ReLU(inplace=True))
            in_c = c
    return torch.nn.Sequential(*mods)


@pytest.mark.parametrize("model,layers", [("vgg19", 8), ("vgg16", 5)])
def test_vgg_features_match_torch(tmp_path, model, layers):
    feats = _torch_features(VGG_CONFIGS[model])
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    npz = tmp_path / "w.npz"
    np.savez(npz, **state_dict_to_npz_arrays(sd))

    params = load_vgg_params_npz(npz, vgg_model=model, layers=layers)
    net = VGGFeatures(vgg_model=model, layers=layers)

    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(net.apply(params, x))

    with torch.no_grad():
        ref = feats[: layers + 1](torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_vgg_loss_matches_torch_pipeline(tmp_path):
    """Full VGGLoss semantics (metrics.py:139-150): grayscale->3ch repeat,
    ImageNet normalization, MSE over feature maps."""
    model, layers = "vgg19", 8
    feats = _torch_features(VGG_CONFIGS[model], seed=3)
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    npz = tmp_path / "w.npz"
    np.savez(npz, **state_dict_to_npz_arrays(sd))

    loss = VGGLoss(vgg_model=model, layers=layers,
                   params=load_vgg_params_npz(npz, model, layers))

    g = np.random.default_rng(2)
    preds = g.uniform(size=(2, 32, 32, 1)).astype(np.float32)
    target = g.uniform(size=(2, 32, 32, 1)).astype(np.float32)
    got = float(loss(preds, target))

    def torch_side(a):
        t = torch.from_numpy(np.repeat(a, 3, axis=-1).transpose(0, 3, 1, 2))
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        with torch.no_grad():
            return feats[: layers + 1]((t - mean) / std)

    ref = float(torch.nn.functional.mse_loss(torch_side(preds),
                                             torch_side(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_exporter_rejects_non_vgg_dict():
    with pytest.raises(ValueError):
        state_dict_to_npz_arrays({"classifier.0.weight": torch.zeros(2)})
