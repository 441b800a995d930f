"""Export torchvision VGG weights to the npz layout `load_vgg_params_npz` eats.

The reference's VGGLoss (metrics/metrics.py:104-150) consumes torchvision's
pretrained ImageNet VGG features. This environment is zero-egress, so the
weights cannot be downloaded here — run this script on any machine that has
them (or a downloaded checkpoint file) and drop the npz next to the repo:

  # from an installed torchvision (downloads/caches the weights):
  python scripts/export_vgg_npz.py --model vgg19 --out vgg19_features.npz

  # from an already-downloaded torchvision checkpoint (.pth state dict):
  python scripts/export_vgg_npz.py --ckpt vgg19-dcbb9e9d.pth --out vgg19_features.npz

Then:  VGGLoss(params=load_vgg_params_npz("vgg19_features.npz")).

Only the `features.N.weight/bias` conv entries are kept (the classifier head
is never used by the loss), so the npz is ~80 MB for vgg19 instead of 550 MB.
Verified bit-exact against torch by tests/test_vgg_loss.py (random-weight
round trip through the same exporter).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def state_dict_to_npz_arrays(state_dict) -> dict:
    """Keep the conv feature weights, as float32 numpy, torchvision keys."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("features.") and k.endswith(("weight", "bias")):
            out[k] = np.asarray(v.detach().cpu().numpy(), dtype=np.float32)
    if not out:
        raise ValueError(
            "no features.N.{weight,bias} entries found — not a torchvision "
            "VGG state dict?"
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="vgg19",
                    choices=["vgg11", "vgg13", "vgg16", "vgg19"])
    ap.add_argument("--ckpt", type=Path, default=None,
                    help=".pth state dict (skips the torchvision download)")
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args()

    import torch

    if args.ckpt is not None:
        sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
        if not isinstance(sd, dict) or "features.0.weight" not in sd:
            sd = getattr(sd, "state_dict", lambda: sd)()
    else:
        import torchvision.models as tvm

        net = getattr(tvm, args.model)(weights="IMAGENET1K_V1")
        sd = net.state_dict()

    arrays = state_dict_to_npz_arrays(sd)
    np.savez(args.out, **arrays)
    print(f"wrote {args.out} ({len(arrays)} arrays)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
