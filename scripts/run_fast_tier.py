#!/usr/bin/env python
"""Run the fast test tier and record its wall time as a round artifact.

VERDICT r4 weak #2: tier latency drifted (459 s r3 -> 501 s r4) with
nothing in-repo tracking it. This runner makes the number a first-class,
per-round artifact so drift is visible: TESTS_r{N}.json with the tier
wall time, test counts and the host's CPU budget.

Usage: python scripts/run_fast_tier.py [--json TESTS_r05.json]
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "not slow", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    m = re.search(r"(\d+) passed", tail)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", tail)
    failed = int(m.group(1)) if m else 0
    result = {
        "tier": 'fast (-m "not slow")',
        "passed": passed,
        "failed": failed,
        "wall_s": round(wall, 1),
        "cpus": os.cpu_count(),
        "rc": proc.returncode,
        "summary_line": tail,
        "target_s": 300,
    }
    print(json.dumps(result))
    if json_out:
        with open(os.path.join(REPO, json_out), "w") as f:
            json.dump(result, f, indent=1)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
