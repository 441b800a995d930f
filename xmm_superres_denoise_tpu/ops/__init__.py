from .preprocess import (
    MODEL_RES,
    NATIVE_HW,
    crop,
    crop_fractions,
    pad_to_res,
    preprocess,
    preprocess_combine,
    unpad_from_res,
    upsample_nearest,
)
from .stretch import (
    STRETCH_MODES,
    Normalizer,
    denormalize,
    destretch,
    normalize,
    stretch,
)

__all__ = [
    "MODEL_RES", "NATIVE_HW", "crop", "crop_fractions", "pad_to_res",
    "preprocess", "preprocess_combine", "unpad_from_res", "upsample_nearest",
    "STRETCH_MODES", "Normalizer", "denormalize", "destretch", "normalize", "stretch",
]
