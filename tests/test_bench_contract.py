"""bench.py driver contract: ONE JSON line with metric/value/unit/
vs_baseline, fastest candidate wins, failures tolerated — and (round-2
postmortem) the deadline/kill paths still deliver a parsed result."""

import importlib.util
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_main_selects_fastest_and_prints_contract(monkeypatch, capsys):
    bench = _load_bench()
    # hermetic: the real probe subprocess would touch the (axon) TPU —
    # shell-level JAX_PLATFORMS=cpu is not honored on that runtime
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: True)
    results = {"xla-b8": 30.0, "s2d-b8": 70.0, "int8-b8": 110.0,
               "int8-b32": 140.0, "s2d-b32": 75.0}

    def fake_candidate(pipeline, batch, budget):
        key = f"{pipeline}-b{batch}"
        if key == "s2d-b32":  # one candidate fails: must be tolerated
            return 1, b"", b"boom"
        return 0, f"{results[key]}\n".encode(), b""

    monkeypatch.setattr(bench, "_run_candidate", fake_candidate)
    bench.main()
    err = capsys.readouterr()
    lines = [l for l in err.out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected ONE JSON line, got {err.out!r}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "sr_416to832_tiles_per_sec"
    assert payload["unit"] == "tiles/s"
    assert payload["value"] == 140.0  # fastest surviving candidate
    assert payload["vs_baseline"] == round(140.0 / 500.0, 3)
    assert "failed" in err.err


def test_bench_candidate_list_covers_int8_and_s2d():
    bench = _load_bench()
    pipes = {p for p, _ in bench.CANDIDATES}
    assert {"xla", "s2d", "int8"} <= pipes
    # the known winner configuration is present AND leads (a global
    # deadline can then only cut slower confirmations, never the winner);
    # int8-b128 measured 148.5 tiles/s stable (b64 144.1, b32 142.9;
    # b256 exhausts device memory)
    assert bench.CANDIDATES[0] == ("int8", 128)


def test_bench_deadline_emits_best_so_far(monkeypatch, capsys):
    """Deadline already passed + a result in hand: no further candidate
    launches; the best-so-far JSON line is still emitted."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "DEADLINE_S", 0.0)
    bench._results["seed-b1"] = 123.0

    def must_not_launch(*a, **k):
        raise AssertionError("candidate launched past the deadline")

    monkeypatch.setattr(bench, "_run_candidate", must_not_launch)
    bench.main()
    out = capsys.readouterr()
    lines = [l for l in out.out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 123.0
    assert "deadline" in out.err


def test_bench_backend_unreachable_emits_honest_zero(monkeypatch, capsys):
    """Chip-down scenario (mid-round-3 tunnel outage): the probe fails, no
    candidate is launched (each would burn its budget on a hung device
    init), and the driver still gets one parseable JSON line — an honest
    zero with a note — instead of rc=124/parsed=null."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: False)

    def must_not_launch(*a, **k):
        raise AssertionError("candidate launched with backend down")

    monkeypatch.setattr(bench, "_run_candidate", must_not_launch)
    bench.main()
    out = capsys.readouterr()
    lines = [l for l in out.out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.out
    payload = json.loads(lines[0])
    assert payload["metric"] == "sr_416to832_tiles_per_sec"
    assert payload["value"] == 0.0
    assert "unreachable" in payload["note"]


def test_probe_backend_gives_up_before_deadline(monkeypatch):
    """A hung device init (TimeoutExpired) stops retrying once too little
    deadline remains for a post-probe candidate window."""
    bench = _load_bench()
    calls = []

    def fake_run(*a, **k):
        calls.append(k.get("timeout"))
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    t0 = time.monotonic()
    assert bench._probe_backend(t0 + 100.0) is False
    assert len(calls) == 1  # remaining < 360s after one failure: no retry
    assert time.monotonic() - t0 < 10.0  # no sleep spent


def test_launch_floor_scales_with_lead_duration():
    """Confirmation launches are gated on a window scaled to the observed
    lead-candidate duration (warm ~2 min vs cold ~13 min differ 6x); with
    no result yet the lead launches with any window, but non-lead
    candidates need a realistic warm-compile window (the leftover minutes
    after a cold lead timeout belong to the cheap last-resort)."""
    bench = _load_bench()
    assert bench._launch_floor(0.0, False) == 30.0
    assert bench._launch_floor(0.0, False, idx=0) == 30.0
    assert bench._launch_floor(0.0, False, idx=1) == 360.0
    assert bench._launch_floor(120.0, True) == max(90.0, 0.8 * 120.0)
    assert bench._launch_floor(780.0, True) == 0.8 * 780.0  # cold lead
    assert bench._launch_floor(10.0, True) == 90.0  # fast lead: keep floor


def test_cold_timeout_is_not_retried_and_cheap_candidate_wins(
    monkeypatch, capsys
):
    """Fully cold cache: every big candidate times out. The lead timeout
    must NOT be retried (round-3 observation: the retry restarted the same
    >budget compile and burned the rest of the deadline), and the cheap
    xla-b8 candidate must still deliver a real number."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: True)
    calls = []

    def fake_candidate(pipeline, batch, budget):
        calls.append(f"{pipeline}-b{batch}")
        if pipeline == "xla":
            return 0, b"34.5\n", b""
        raise subprocess.TimeoutExpired(cmd=pipeline, timeout=budget)

    monkeypatch.setattr(bench, "_run_candidate", fake_candidate)
    bench.main()
    out = capsys.readouterr()
    lines = [l for l in out.out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 34.5
    assert calls.count("int8-b128") == 1, calls  # timeout not retried


def test_failed_note_distinguishes_cold_starvation(capsys):
    """A 0.0 caused purely by budget timeouts (fully cold cache on a slow
    tunnel) must say so — it is an environment condition, not a framework
    regression — while a 0.0 with no timeouts stays a loud failure."""
    bench = _load_bench()
    bench._results["failed"] = 0.0
    bench._timeouts = 3
    bench._emit_result()
    payload = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][0]
    )
    assert "cold-compile starvation" in payload["note"]

    bench2 = _load_bench()
    bench2._results["failed"] = 0.0
    bench2._emit_result()
    payload2 = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][0]
    )
    assert "framework failure" in payload2["note"]


def test_last_resort_runs_inside_fallback_reserve(monkeypatch, capsys):
    """After a cold lead timeout eats most of the deadline, non-lead big
    candidates are skipped (360 s floor) and the last-resort xla-b8 runs
    inside the reserved window."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: True)
    # deadline small enough that, with the 300 s fallback reserve, only
    # the lead (30 s floor) and then the last-resort can launch
    monkeypatch.setattr(bench, "DEADLINE_S", 350.0)
    calls = []

    def fake_candidate(pipeline, batch, budget):
        calls.append(f"{pipeline}-b{batch}")
        if pipeline == "xla":
            return 0, b"34.5\n", b""
        raise subprocess.TimeoutExpired(cmd=pipeline, timeout=budget)

    monkeypatch.setattr(bench, "_run_candidate", fake_candidate)
    bench.main()
    out = capsys.readouterr()
    lines = [l for l in out.out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 34.5
    assert calls == ["int8-b128", "xla-b8"], calls
    assert "last-resort" in out.err


def test_seed_cache_links_tracked_entries(monkeypatch, tmp_path):
    """res/bench_cache (tracked) seeds the live compile-cache dir so a fresh
    checkout still runs the lead candidate warm."""
    bench = _load_bench()
    seed = tmp_path / "seed"
    seed.mkdir()
    (seed / "jit_chain_fn-abc-cache").write_bytes(b"compiled-blob")
    (seed / "sub").mkdir()  # non-files must be skipped, not crash
    live = tmp_path / "live"  # created by the seeder
    monkeypatch.setattr(bench, "_SEED_CACHE", str(seed))
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(live))
    bench._seed_cache()
    assert (live / "jit_chain_fn-abc-cache").read_bytes() == b"compiled-blob"
    # idempotent: existing entries are left alone
    (live / "jit_chain_fn-abc-cache").write_bytes(b"newer")
    bench._seed_cache()
    assert (live / "jit_chain_fn-abc-cache").read_bytes() == b"newer"


def test_seed_cache_absent_dir_is_noop(monkeypatch, tmp_path):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_SEED_CACHE", str(tmp_path / "nope"))
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "live"))
    bench._seed_cache()  # must not raise or create anything
    assert not (tmp_path / "live").exists()


def test_bench_sigterm_kill_path_delivers_json():
    """End-to-end: a SIGTERM mid-run (the driver's timeout behavior that ate
    BENCH_r02) still yields rc=0 and one parseable JSON line."""
    env = dict(
        os.environ,
        XMMSR_BENCH_FAKE="222.5",
        XMMSR_BENCH_FAKE_SLEEP_S="300",
        XMMSR_BENCH_DEADLINE_S="600",
    )
    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "bench.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
    )
    # lead candidate (no stall) finishes in ~a second; the second stalls.
    # Generous wait: under parallel-suite CPU load the two interpreter
    # startups before the stall can take several seconds.
    time.sleep(20)
    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=30)
    assert proc.returncode == 0, (out, err)
    lines = [l for l in out.decode().strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, (out, err)
    payload = json.loads(lines[0])
    assert payload["metric"] == "sr_416to832_tiles_per_sec"
    assert payload["value"] == 222.5


def test_apply_cache_config_sets_flag_when_unset(monkeypatch):
    """Under site hooks that PRE-IMPORT jax, the env-var route for the
    compilation cache is silently too late (measured: candidates paid full
    remote compiles with a warm cache on disk). _apply_cache_config must
    set the flag via jax.config, and must not override an explicit one."""
    import jax

    bench = _load_bench()
    prior = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/contract_cache")
        bench._apply_cache_config()
        assert jax.config.jax_compilation_cache_dir == "/tmp/contract_cache"

        # an explicit setting wins over the repo default
        jax.config.update("jax_compilation_cache_dir", "/tmp/explicit")
        bench._apply_cache_config()
        assert jax.config.jax_compilation_cache_dir == "/tmp/explicit"
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)


def test_dn_flagship_field_in_payload(monkeypatch, capsys):
    """BASELINE's metric row is "SR+denoise": when the DN candidate
    (dn-int8 b128) completes after the SR sweep, the payload carries
    `dn_tiles_per_sec` + its fidelity class so DN regressions are
    driver-visible (VERDICT r4 #5). The SR metric is never displaced."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_backend", lambda deadline: True)
    results = {"int8-b128": 148.0, "int8-b32": 142.0, "s2d-b32": 75.0,
               "s2d-b8": 72.0, "xla-b8": 34.0, "dn-int8-b128": 160.5}

    def fake_candidate(pipeline, batch, budget):
        return 0, f"{results[f'{pipeline}-b{batch}']}\n".encode(), b""

    monkeypatch.setattr(bench, "_run_candidate", fake_candidate)
    bench.main()
    out = capsys.readouterr()
    lines = [l for l in out.out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["value"] == 148.0  # SR winner, not the DN number
    assert payload["dn_tiles_per_sec"] == 160.5
    assert payload["dn_fidelity"] == "int8-40dB"
    assert "dn-int8-b128" not in payload["candidates"]  # SR table only
