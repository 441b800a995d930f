"""Re-warm the bench compile cache after a tunnel reconnect.

XLA compile-cache keys hash the backend-session fingerprint and rotate
when the dev tunnel reconnects (docs/PERFORMANCE.md), so after a reconnect
every bench candidate is cold — and a fully cold lead compile can exceed
its per-candidate budget (measured >900 s for int8-b128). This script runs
each candidate ONE AT A TIME (two concurrent TPU compiles serialize on the
relay and both blow their timeouts) with a generous bound and never kills
an in-flight compile early, repopulating `.jit_cache/` so the next
`python bench.py` is all-warm (~2 min lead candidate).

Usage:  python scripts/warm_bench_cache.py [--lead-only]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "bench.py")
# Generous per-candidate bound: big enough for the worst observed cold
# compile (~16 min) + the timed run; killing an in-flight remote compile
# leaves the relay draining it for many minutes, so never bound tightly.
TIMEOUT_S = int(os.environ.get("XMMSR_WARM_TIMEOUT_S", "1800"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--lead-only", action="store_true",
        help="warm only the lead (winner) candidate and the last-resort "
        "xla pipeline — the minimum for guaranteed driver delivery",
    )
    args = ap.parse_args(argv)

    sys.path.insert(0, ROOT)
    import bench  # noqa: E402  (for CANDIDATES — keep one authority)

    candidates = list(bench.CANDIDATES)
    if args.lead_only:
        candidates = [candidates[0]]
    else:
        # the DN flagship candidate runs after the SR sweep in bench.main
        # (payload field dn_tiles_per_sec) and needs warmth like the rest
        candidates.append(("dn-int8", 128))
    # the last-resort pipeline must be warm too: it is what delivers when
    # everything else is cold, and it is not in CANDIDATES' warm set twice
    if ("xla", 8) not in candidates:
        candidates.append(("xla", 8))

    failures = 0
    for pipeline, batch in candidates:
        key = f"{pipeline}-b{batch}"
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, BENCH, "--pipeline", pipeline, str(batch)],
                timeout=TIMEOUT_S, capture_output=True, text=True,
            )
            dt = time.monotonic() - t0
            if proc.returncode == 0:
                # rc==0 with empty/garbled stdout must not crash the warm
                # loop and skip the remaining candidates (ADVICE r3 #4)
                try:
                    val = float(proc.stdout.strip().splitlines()[-1])
                    print(f"warm {key}: {val:.1f} tiles/s in {dt:.0f}s")
                except (IndexError, ValueError):
                    failures += 1
                    print(
                        f"warm {key}: rc=0 but unparseable stdout "
                        f"({proc.stdout[-120:]!r}) in {dt:.0f}s"
                    )
            else:
                failures += 1
                print(
                    f"warm {key}: FAILED rc={proc.returncode} in {dt:.0f}s: "
                    f"{proc.stderr[-300:]}"
                )
        except subprocess.TimeoutExpired:
            failures += 1
            print(f"warm {key}: exceeded {TIMEOUT_S}s — relay may drain "
                  "the killed compile for several minutes; pausing 120s")
            time.sleep(120.0)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
