"""Model registry: config -> Flax module (reference model.py:153-237).

Routes `ModelCfg` to the architecture implementations, deriving the SR
upscale count from hr/lr resolution exactly like `Model.configure_model`
(up_scale = hr/lr, must be a power-of-2 multiple; num_upsample = up_scale/2
pixel-shuffle stages at x2 each — model.py:160-167).
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from ..config.schema import BaseModels, ModelCfg
from .rrdb import GeneratorRRDB_DN, GeneratorRRDB_SR


def build_model(
    config: ModelCfg, lr_shape: Tuple[int, int], hr_shape: Tuple[int, int]
) -> nn.Module:
    name = config.name
    m = config.model

    if name is BaseModels.ESR_GEN:
        up_scale = hr_shape[0] / lr_shape[0]
        if up_scale % 2 != 0:
            raise ValueError(
                f"Upscaling is not a multiple of two but {up_scale}, "
                f"based on in_dims {lr_shape} and out_dims {hr_shape}"
            )
        return GeneratorRRDB_SR(
            in_channels=m.in_channels,
            out_channels=m.out_channels,
            num_filters=m.filters,
            num_res_blocks=m.residual_blocks,
            num_upsample=int(up_scale / 2),
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
        )

    if name is BaseModels.RESTORMER:
        from .restormer import Restormer

        return Restormer(
            inp_channels=m.in_channels,
            out_channels=m.out_channels,
            dim=m.dim,
        )

    raise ValueError(f"Unknown model {name}")
