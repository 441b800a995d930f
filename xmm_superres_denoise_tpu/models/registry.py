"""Model registry: config -> Flax module (reference model.py:153-237).

Routes `ModelCfg` to the architecture implementations, deriving the SR
upscale count from hr/lr resolution exactly like `Model.configure_model`
(up_scale = hr/lr, must be a power-of-2 multiple; num_upsample = up_scale/2
pixel-shuffle stages at x2 each — model.py:160-167).
"""

from __future__ import annotations

import math
from typing import Tuple

from flax import linen as nn

from ..config.schema import BaseModels, ModelCfg
from .rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR


def build_model(
    config: ModelCfg, lr_shape: Tuple[int, int], hr_shape: Tuple[int, int]
) -> nn.Module:
    name = config.name
    m = config.model

    if config.scan_layers and name not in (
        BaseModels.SWINIR,
        BaseModels.SWINFIR,
        BaseModels.DRCT,
        BaseModels.HAT,
    ):
        # fail loudly: the flag exists to compress repeated transformer
        # group stacks; silently ignoring it would leave the compile-size
        # symptom it addresses in place with a config that looks correct
        raise ValueError(
            f"scan_layers is a Swin-family knob (swinir/swinfir/drct/hat); "
            f"{name.value} has no scanned form"
        )

    if name is BaseModels.ESR_GEN:
        up_scale = hr_shape[0] / lr_shape[0]
        # each upsample stage is a x2 PixelShuffle, so the scale must be a
        # power of two and the stage count its log2. The reference's
        # `int(up_scale / 2)` (model.py:160-167) happens to agree at 2x/4x
        # but builds a 16x model for an 8x config.
        n_stages = math.log2(up_scale) if up_scale > 0 else -1.0
        if up_scale < 2 or n_stages != int(n_stages):
            raise ValueError(
                f"Upscaling must be a power-of-two multiple >= 2, got "
                f"{up_scale} (in_dims {lr_shape}, out_dims {hr_shape})"
            )
        return GeneratorRRDB_SR(
            in_channels=m.in_channels,
            out_channels=m.out_channels,
            num_filters=m.filters,
            num_res_blocks=m.residual_blocks,
            num_upsample=int(n_stages),
            memory_efficient=config.memory_efficient,
        )

    if name is BaseModels.RRDB_DENOISE:
        return GeneratorRRDB_DN(
            in_channels=m.in_channels,
            out_channels=m.out_channels,
            num_filters=m.filters,
            num_res_blocks=m.residual_blocks,
            memory_efficient=config.memory_efficient,
        )

    if name in (BaseModels.SWINIR, BaseModels.SWINFIR, BaseModels.DRCT, BaseModels.HAT):
        from .swin_zoo import build_swin_family

        return build_swin_family(
            name,
            m,
            upscale=hr_shape[0] // lr_shape[0],
            memory_efficient=config.memory_efficient,
            scan_layers=config.scan_layers,
        )

    if name is BaseModels.RESTORMER:
        from .restormer import Restormer

        return Restormer(
            inp_channels=m.in_channels,
            out_channels=m.out_channels,
            dim=m.dim,
        )

    raise ValueError(f"Unknown model {name}")
