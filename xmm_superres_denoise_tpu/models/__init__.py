from .drct import DRCT, RDG
from .hat import HAT
from .registry import build_model
from .restormer import Restormer
from .rrdb import (
    RRDB,
    GeneratorRRDB_DN,
    GeneratorRRDB_SR,
    ResidualDenseBlock5C,
    pixel_shuffle,
    pixel_unshuffle,
)
from .swinir import SwinFIR, SwinIR
from .swin_common import (
    BasicLayer,
    SwinTransformerBlock,
    WindowAttention,
    window_partition,
    window_reverse,
)

__all__ = [
    "DRCT", "HAT", "RDG", "RRDB", "Restormer", "BasicLayer",
    "GeneratorRRDB_DN", "GeneratorRRDB_SR", "ResidualDenseBlock5C",
    "SwinFIR", "SwinIR", "SwinTransformerBlock", "WindowAttention",
    "build_model", "pixel_shuffle", "pixel_unshuffle",
    "window_partition", "window_reverse",
]
