"""bench.py driver contract: ONE JSON line with metric/value/unit/
vs_baseline, fastest candidate wins, failures tolerated."""

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_main_selects_fastest_and_prints_contract(monkeypatch, capsys):
    bench = _load_bench()
    results = {"xla-8": 30.0, "s2d-8": 70.0, "int8-8": 110.0,
               "int8-32": 140.0, "s2d-32": 75.0}

    def fake_run(args, capture_output=True, timeout=None):
        pipeline, batch = args[-2], args[-1]
        key = f"{pipeline}-{batch}"
        if key == "s2d-32":  # one candidate fails: must be tolerated
            return subprocess.CompletedProcess(args, 1, b"", b"boom")
        return subprocess.CompletedProcess(
            args, 0, f"{results[key]}\n".encode(), b""
        )

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    err = capsys.readouterr()
    lines = [l for l in err.out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected ONE JSON line, got {err.out!r}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "sr_416to832_tiles_per_sec"
    assert payload["unit"] == "tiles/s"
    assert payload["value"] == 140.0  # fastest surviving candidate
    assert payload["vs_baseline"] == round(140.0 / 500.0, 3)
    assert "s2d-b32 failed" in err.err or "failed" in err.err


def test_bench_candidate_list_covers_int8_and_s2d():
    bench = _load_bench()
    pipes = {p for p, _ in bench.CANDIDATES}
    assert {"xla", "s2d", "int8"} <= pipes
    # the known winner configuration is present
    assert ("int8", 32) in bench.CANDIDATES
