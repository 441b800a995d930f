from .rrdb import (
    RRDB,
    GeneratorRRDB_DN,
    GeneratorRRDB_SR,
    ResidualDenseBlock5C,
    pixel_shuffle,
    pixel_unshuffle,
)

__all__ = [
    "RRDB", "GeneratorRRDB_DN", "GeneratorRRDB_SR", "ResidualDenseBlock5C",
    "pixel_shuffle", "pixel_unshuffle",
]
