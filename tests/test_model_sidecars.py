"""Production-checkpoint data-config sidecars mirror the reference exactly.

The reference's shipped ONNX models carry YAML sidecars pinning the
inference-time dataset settings (models/*_sim_data_config.yaml); the TOML
mirrors in res/models/ must agree value-for-value so that when the real
weights are imported the serving configuration is unambiguous."""

import tomllib
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
REF = Path("/root/reference/models")


def _parse_ref_yaml(path: Path) -> dict:
    out = {}
    for line in path.read_text().splitlines():
        line = line.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        k, v = (s.strip() for s in line.split(":", 1))
        v = v.strip('"')
        if v in ("True", "False"):
            out[k] = v == "True"
        else:
            try:
                out[k] = int(v) if "." not in v else float(v)
            except ValueError:
                out[k] = v
    return out


@pytest.mark.parametrize("name", ["XMM-SuperRes", "XMM-DeNoise"])
def test_sidecar_matches_reference(name):
    ref_path = REF / f"{name}_sim_data_config.yaml"
    if not ref_path.exists():
        pytest.skip("reference sidecar unavailable")
    ref = _parse_ref_yaml(ref_path)
    with open(ROOT / "res/models" / f"{name}_sim_data_config.toml", "rb") as f:
        ours = tomllib.load(f)
    for key, val in ours.items():
        assert key in ref, f"{key} not in reference sidecar"
        assert ref[key] == val, (key, ref[key], val)
    # the science-critical constants specifically
    assert ours["lr_max"] == 0.0022336
    assert ours["data_scaling"] == "sqrt"
