"""Pin the on-device measured artifacts that back README's claims.

Two artifact families are quoted in README's measured-status table:

* `docs/fidelity_classes.json` — max|abs diff| / PSNR of every serving
  pipeline vs the f32 forward on trained weights + real example inputs
  (scripts/device_fidelity_classes.py; VERDICT r4 #1). The README labels
  (f32 = parity class, bf16/int8 = measured dB classes) must match what
  the probe actually established.
* `docs/convergence_*/summary.json` — the zoo convergence matrix
  (reference trainable models, /root/reference/res/configs/models.toml).

These tests FAIL (not skip) on schema drift or a claim the data does not
support, and skip only when an artifact has not been generated in this
checkout (the probes need the TPU).
"""

import json
import math
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
FIDELITY = REPO / "docs" / "fidelity_classes.json"


def _summaries():
    out = {}
    for d in sorted(REPO.glob("docs/convergence*")):
        s = d / "summary.json"
        if d.is_dir() and s.exists():
            out[d.name] = json.loads(s.read_text())
    return out


@pytest.mark.skipif(not FIDELITY.exists(), reason="probe not run here")
class TestFidelityClasses:
    @pytest.fixture(scope="class")
    def data(self):
        return json.loads(FIDELITY.read_text())

    def test_schema_and_coverage(self, data):
        # every serving pipeline the engine exposes has a measured class
        assert set(data["classes"]) >= {"s2d-f32", "s2d-bf16", "xla-bf16",
                                        "int8"}
        for name, entry in data["classes"].items():
            assert entry["max_abs_diff"] >= 0.0, name
            assert math.isfinite(entry["psnr_db_vs_f32"]) or entry[
                "max_abs_diff"] == 0.0, name

    def test_measured_on_trained_weights(self, data):
        # VERDICT r4 #1b demands TRAINED weights (the esr_gen convergence
        # checkpoint), not random init — the honest-fallback marker must
        # not have been quoted into the README table.
        assert data["trained"] is True

    def test_f32_is_the_parity_class(self, data):
        # the engine contract (infer/run_file.py) names f32 the parity
        # configuration; the S2D rearrangement is exact so only float
        # reassociation noise is allowed — far inside the 1e-3 bar
        entry = data["classes"]["s2d-f32"]
        assert entry["clears_1e3_parity"] is True
        assert entry["max_abs_diff"] <= 1e-4

    def test_bf16_is_not_parity_grade(self, data):
        # the round-4 README mislabel: bf16 mantissa granularity near 1.0
        # is ~4e-3, so bf16 must NOT be advertised at the 1e-3 bar unless
        # the probe actually measured it inside (it does not, on any
        # trained checkpoint observed)
        for name in ("s2d-bf16", "xla-bf16"):
            entry = data["classes"][name]
            assert entry["clears_1e3_parity"] == (
                entry["max_abs_diff"] <= data["parity_tol"]
            )

    def test_int8_meets_its_gate(self, data):
        # the serving gate tests/test_int8_forward.py enforces >=40 dB on
        # random weights; the recorded class on trained weights must meet
        # the same bar or the README "int8-40dB" label is wrong
        assert data["classes"]["int8"]["psnr_db_vs_f32"] >= 40.0


class TestConvergenceSummaries:
    @pytest.fixture(scope="class")
    def summaries(self):
        s = _summaries()
        if not s:
            pytest.skip("no convergence runs in this checkout")
        return s

    def test_schema(self, summaries):
        for name, s in summaries.items():
            for key in ("epochs", "best_val_loss", "first_val_loss",
                        "val_min_by_quarter_window", "metric_gains_vs_input"):
                assert key in s, (name, key)
            assert s["epochs"] > 0, name
            assert len(s["val_min_by_quarter_window"]) == 4, name

    def test_training_improved_val(self, summaries):
        for name, s in summaries.items():
            assert s["best_val_loss"] < s["first_val_loss"], name

    def test_model_beats_input_baseline(self, summaries):
        # the core quality claim (reference model.py input-metric
        # semantics): trained PSNR/SSIM above the raw-LR baseline
        for name, s in summaries.items():
            gains = s["metric_gains_vs_input"]
            assert gains, name
            for metric, g in gains.items():
                assert g["beats_input"], (name, metric)

    def test_plateau_runs_are_monotone_by_quarter(self, summaries):
        # runs quoted as "trained to plateau" must have non-increasing
        # quarter-window val minima; the Restormer runs are documented
        # early-best tiny-dataset overfit (docs/convergence_restormer/
        # DIAGNOSIS.md) and are exempt from monotonicity, not from the
        # beats-input and schema checks above
        for name, s in summaries.items():
            if "restormer" in name:
                continue
            q = s["val_min_by_quarter_window"]
            assert all(b <= a + 1e-9 for a, b in zip(q, q[1:])), (name, q)
