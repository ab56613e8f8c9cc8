"""Time each stage of dryrun_multichip on the virtual CPU mesh.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/time_dryrun.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def mark(name):
    print(f"[{time.time() - t0:8.1f}s] {name}", file=sys.stderr, flush=True)


mark("start")
import __graft_entry__ as ge

mark("import done")
ge.dryrun_multichip(8)
mark("dryrun done")
