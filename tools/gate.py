"""End-of-round gate: run every check CLAUDE.md requires, in sequence,
and exit nonzero if any fails.

Usage: python tools/gate.py [--full]

Default (the per-change gate):
  1. driver_sim at sf0.01   (the driver's correctness pass)
  2. strict_compare at sf0.01 (driver-safe output representations)
  3. pytest tests/ -x -q

--full additionally spot-checks sf0.1 for both (one historical bug only
reproduced there) — run it before declaring a round done.

Round 5 shipped with temporal_joins broken because the gates existed
but were not re-run after the environment drifted; this script makes
"done" mechanical: the round's last commit should record its output.
Subprocess-per-step so each gets a fresh JVM (two concurrent Spark
workloads on one box skew timings and can deadlock the shuffle dirs).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(label: str, args: list[str], timeout: int) -> bool:
    print(f"=== {label} ===", flush=True)
    t0 = time.time()
    try:
        rc = subprocess.run(args, timeout=timeout, cwd=REPO).returncode
    except subprocess.TimeoutExpired:
        print(f"GATE-TIMEOUT {label} after {timeout}s")
        return False
    print(f"=== {label}: {'OK' if rc == 0 else f'FAIL rc={rc}'} ({time.time() - t0:.0f}s) ===\n", flush=True)
    return rc == 0


def static_checks() -> bool:
    """Repo-rule greps that need no JVM. Currently: no global-sort
    window (``Window.orderBy`` with no partition spec funnels the
    whole relation through one task) anywhere in the package — use
    operators/indexing.py:with_global_index instead."""
    print("=== static checks ===", flush=True)
    bad: list[str] = []
    pkg = os.path.join(REPO, "monday_etl_automation_spark")
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as f:
                for i, line in enumerate(f, 1):
                    if "Window.orderBy" in line:
                        bad.append(f"{path}:{i}: {line.strip()}")
    for hit in bad:
        print(f"GLOBAL-WINDOW {hit}")
    print(f"=== static checks: {'OK' if not bad else 'FAIL'} ===\n", flush=True)
    return not bad


def main() -> int:
    full = "--full" in sys.argv[1:]
    steps = [
        ("driver_sim sf0.01", [sys.executable, f"{HERE}/driver_sim.py", "/root/testdata/sf0.01"], 900),
        ("strict_compare sf0.01", [sys.executable, f"{HERE}/strict_compare.py", "/root/testdata/sf0.01"], 900),
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"], 1500),
    ]
    if full:
        steps += [
            ("driver_sim sf0.1", [sys.executable, f"{HERE}/driver_sim.py", "/root/testdata/sf0.1"], 1200),
            ("strict_compare sf0.1", [sys.executable, f"{HERE}/strict_compare.py", "/root/testdata/sf0.1"], 1200),
        ]
    results = [("static checks", static_checks())]
    results += [(label, run(label, args, timeout)) for label, args, timeout in steps]
    print("GATE SUMMARY:")
    for label, ok in results:
        print(f"  {'PASS' if ok else 'FAIL'}  {label}")
    return 0 if all(ok for _, ok in results) else 1


if __name__ == "__main__":
    sys.exit(main())
