"""Round-end warm-cache invariant check (VERDICT r4 item 2).

Runs the driver's exact bench command (`python bench.py`) as a subprocess
and asserts, from the emitted JSON itself, that

  1. the run produced a non-zero headline value, and
  2. it wrote ZERO new compile-cache entries (`detail.cache_entries_new`,
     counted by bench.py against a startup snapshot of `.jax_cache/`),

i.e. "would the driver's bench run compile-free right now?" — the question
round 4 had no tool to answer (fast-GN landed 10:33, snapshot 10:58, the
driver's 11:20 bench then hit cold score-path programs and timed out).

Run AFTER the last traced-code commit of a round; record the verdict in
STATUS.md.  Exit 0 == warm+green, 1 == ran but cold or zero-valued,
2 == bench itself failed to produce JSON.

Usage:
    python tools/assert_warm.py [--timeout S] [-- extra bench args]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--timeout", type=float, default=1800.0)
    p.add_argument("bench_args", nargs="*",
                   help="extra args forwarded to bench.py (after --)")
    args = p.parse_args()

    cmd = [sys.executable, "bench.py", *args.bench_args]
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=args.timeout
    )
    elapsed = time.time() - t0

    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    result = None
    for ln in reversed(lines):  # last JSON line wins (enriched emission)
        try:
            result = json.loads(ln)
            break
        except json.JSONDecodeError:
            continue
    if result is None:
        print(json.dumps({
            "warm_check": "FAIL", "reason": "bench emitted no JSON",
            "rc": proc.returncode, "elapsed_s": round(elapsed, 1),
            "stderr_tail": proc.stderr[-2000:],
        }))
        return 2

    new_entries = result.get("detail", {}).get("cache_entries_new")
    ok = bool(result.get("value")) and new_entries == 0
    print(json.dumps({
        "warm_check": "PASS" if ok else "FAIL",
        "cache_entries_new": new_entries,
        "value": result.get("value"),
        "metric": result.get("metric"),
        "mode": result.get("detail", {}).get("mode"),
        "elapsed_s": round(elapsed, 1),
        "bench_rc": proc.returncode,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
