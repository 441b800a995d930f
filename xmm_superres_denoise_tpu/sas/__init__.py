from .pipeline import (
    check_pps_dir,
    filter_events_gti,
    make_detxy_image,
    make_gti_pps,
    sas_available,
)

__all__ = [
    "check_pps_dir", "filter_events_gti", "make_detxy_image", "make_gti_pps",
    "sas_available",
]
