"""XMM output-product FITS writing with reconstructed WCS.

Re-implements the reference's product writers
(`/root/reference/xmm_superres_denoise/utils/filehandling.py:9-247`) on the
dependency-free FITS layer:

  * `write_xmm_product` — sim-centered WCS (CRPIX at the boresight of the
    padded frame, CDELT 4"/res_mult, RA/DEC = 0; filehandling.py:82-104).
  * `write_xmm_product_wcs` — carries the input detxy image's WCS through:
    empirical pad shift CRPIX+=(6, 2) (the 416-pad offset of the native
    403x411 frame; filehandling.py:207-209), and for 2x outputs the
    CRPIX/CDELT rescale + CROTA2/CD matrix from `PA_PNT`
    (filehandling.py:211-230).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from .fits import Header, write_image

# Keys never propagated from the source header (filehandling.py:25-72).
_OMIT_BASE = [
    "SIMPLE", "BITPIX", "NAXIS", "NAXIS1", "NAXIS2", "EXTEND", "XPROC0",
    "XDAL0", "CREATOR", "DATE",
    "CTYPE1L", "CRPIX1L", "CRVAL1L", "CDELT1L", "LTV1", "LTM1_1",
    "CTYPE2L", "CRPIX2L", "CRVAL2L", "CDELT2L", "LTV2", "LTM2_2",
    "LTM1_2", "LTM2_1",
] + [f"ONTIME{i:02d}" for i in range(1, 13)] + ["EXPOSURE", "DURATION"]

# The non-WCS writer additionally drops the sky WCS keys and rebuilds them.
_OMIT_WCS_TOO = _OMIT_BASE + [
    "CTYPE1", "CRPIX1", "CRVAL1", "CDELT1",
    "CTYPE2", "CRPIX2", "CRVAL2", "CDELT2",
]


def _carry_header(in_header: Optional[Header], omit) -> Header:
    out = Header()
    if in_header:
        for k, v in in_header.items():
            if k not in omit:
                out[k] = v
    return out


def write_xmm_product(
    img: np.ndarray,
    output_dir: Path,
    source_file_name: str,
    res_mult: int,
    exposure: float,
    comment: Optional[str] = None,
    out_file_name: Optional[str] = None,
    in_header: Optional[Header] = None,
) -> Path:
    """Sim-centered-WCS product (filehandling.py:9-120)."""
    header = _carry_header(in_header, _OMIT_WCS_TOO)
    header["IMG_FILE"] = source_file_name
    header["EXPOSURE"] = exposure
    header["CDELT1"] = -0.00111111113801599 / res_mult
    header["CDELT2"] = 0.00111111113801599 / res_mult
    if res_mult == 1:
        header["CRPIX1"] = 244.0
        header["CRPIX2"] = 224.0
    elif res_mult == 2:
        header["CRPIX1"] = 487.5
        header["CRPIX2"] = 447.5
    header["CUNIT1"] = "deg"
    header["CUNIT2"] = "deg"
    header["CRVAL1"] = 0.0
    header["CRVAL2"] = 0.0
    header["CTYPE1"] = "RA---TAN"
    header["CTYPE2"] = "DEC--TAN"
    if comment:
        header["COMMENT"] = comment

    name = out_file_name or source_file_name
    return write_image(Path(output_dir) / f"{name}.fits.gz", np.asarray(img), header)


def write_xmm_product_wcs(
    img: np.ndarray,
    output_dir: Path,
    source_file_name: str,
    res_mult: int,
    exposure: float,
    comment: Optional[str] = None,
    out_file_name: Optional[str] = None,
    in_header: Optional[Header] = None,
) -> Path:
    """WCS-carrying product (filehandling.py:131-247).

    CRPIX shift (+6, +2) aligns the detxy WCS with the 416^2 zero-padding of
    the native (403, 411) frame; 2x products rescale CRPIX/CDELT and add the
    CROTA2/CD matrix from PA_PNT.
    """
    header = _carry_header(in_header, _OMIT_BASE)
    header["IMG_FILE"] = source_file_name
    header["EXPOSURE"] = exposure

    crpix1 = float(header.get("CRPIX1", 0.0)) + 6.0
    crpix2 = float(header.get("CRPIX2", 0.0)) + 2.0
    header["CRPIX1"] = crpix1
    header["CRPIX2"] = crpix2
    if res_mult == 2:
        header["CRPIX1"] = res_mult * crpix1 + 0.5
        header["CRPIX2"] = res_mult * crpix2 + 0.5
        cdelt1 = float(header["CDELT1"]) / res_mult
        cdelt2 = float(header["CDELT2"]) / res_mult
        header["CDELT1"] = cdelt1
        header["CDELT2"] = cdelt2
        if "PA_PNT" in header:
            crota2 = 90.0 - float(header["PA_PNT"])
            header["CROT2"] = crota2
            r = math.radians(crota2)
            header["CD1_1"] = cdelt1 * math.cos(r)
            header["CD1_2"] = -1.0 * cdelt2 * math.sin(r)
            header["CD2_1"] = cdelt1 * math.sin(r)
            header["CD2_2"] = cdelt2 * math.cos(r)

    if comment:
        header["COMMENT"] = comment
    name = out_file_name or f"{source_file_name.replace('.fits', '')}_sr_predict"
    return write_image(Path(output_dir) / f"{name}.fits.gz", np.asarray(img), header)


def detxy_wcs_header(
    meta: Dict[str, Any], in_header: Header, ref_pix: Optional[Dict[str, float]] = None
) -> Header:
    """WCS header for a freshly binned detxy image (make_detxy_image's
    ecoordconv step, xmmsas_tools.py:567-618).

    Without SAS's `ecoordconv`, the reference pixel must be supplied
    (`ref_pix` = {"xima", "yima", "ra", "dec"}); REFX/REFY CDELTs come from
    the event header when present.
    """
    hdr = Header()
    for k, v in in_header.items():
        hdr[k] = v
    if ref_pix is not None:
        hdr["CRVAL1"] = float(ref_pix["ra"])
        hdr["CRVAL2"] = float(ref_pix["dec"])
        hdr["CRPIX1"] = float(ref_pix["xima"])
        hdr["CRPIX2"] = float(ref_pix["yima"])
    if "REFYCDLT" in in_header and "REFXCDLT" in in_header:
        cdelt1 = meta["bin_size"] * float(in_header["REFYCDLT"])
        cdelt2 = -meta["bin_size"] * float(in_header["REFXCDLT"])
        hdr["CDELT1"] = cdelt1
        hdr["CDELT2"] = cdelt2
        hdr["CTYPE1"] = "RA---TAN"
        hdr["CTYPE2"] = "DEC--TAN"
        if "PA_PNT" in in_header:
            crota2 = 90.0 - float(in_header["PA_PNT"])
            hdr["CROT2"] = crota2
            r = math.radians(crota2)
            hdr["CD1_1"] = cdelt1 * math.cos(r)
            hdr["CD1_2"] = -1.0 * cdelt2 * math.sin(r)
            hdr["CD2_1"] = cdelt1 * math.sin(r)
            hdr["CD2_2"] = cdelt2 * math.cos(r)
    hdr["EXPOSURE"] = meta.get("exposure", 0.0)
    return hdr
