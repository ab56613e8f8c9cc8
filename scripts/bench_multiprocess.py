#!/usr/bin/env python
"""Cross-host mechanism check: 2 OS processes, 4 virtual CPU devices each,
one 8-device global mesh over the jax.distributed runtime.

The single-process virtual mesh (tests, dryrun) exercises the sharding
*math*; this script exercises the *process boundary* the N-host BASELINE
column implies (SURVEY.md §2.3 DCN obligation): device-to-device collectives
here cross a real inter-process transport, the same code path a multi-host
TPU pod takes over DCN. Mechanism only — no performance claims on a 2-core
CPU host.

Checks (global mesh, row-sharded):
  1. four-step distributed NTT forward/inverse == single-device transform
  2. wire-sharded constraint check of a bigint pow_mod circuit -> 0 violations

Usage:  python scripts/bench_multiprocess.py [--json SCALING_r05.json]
(parent spawns both workers; workers are re-execs of this file)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("HALO2_RSA_TPU_MP_PORT", "39117"))
NPROC = 2
LOCAL_DEVICES = 4


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=pid,
    )
    assert jax.process_count() == NPROC
    devs = jax.devices()  # global: NPROC * LOCAL_DEVICES
    n_global = len(devs)
    assert n_global == NPROC * LOCAL_DEVICES, devs

    import random

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from halo2_rsa_tpu.bigint import BigIntChip
    from halo2_rsa_tpu.circuit import Builder, checker
    from halo2_rsa_tpu.fields import BN254_FR, vecfield
    from halo2_rsa_tpu.parallel import (
        WireShardedChecker,
        intt_sharded,
        ntt_sharded,
    )
    from halo2_rsa_tpu.prover import ntt as ntt_mod

    from jax.experimental.multihost_utils import process_allgather

    def fetch(x):
        """Globally-sharded array -> full host value in every process
        (plain device_get refuses arrays spanning non-addressable devices)."""
        return np.asarray(process_allgather(x, tiled=True))

    fr = vecfield.consts(BN254_FR)
    mesh = Mesh(np.array(devs).reshape(n_global), ("rows",))

    # --- 1) distributed NTT across the process boundary ------------------
    log_n = 10
    rng = random.Random(0)
    vals = [rng.randrange(BN254_FR.p) for _ in range(1 << log_n)]
    x = jnp.asarray(vecfield.from_ints_np(fr, vals, mont=True))
    got = fetch(ntt_sharded(x, log_n, mesh))
    want = np.asarray(ntt_mod.ntt(x, log_n))
    assert (got == want).all(), "cross-process NTT mismatch"
    rt = fetch(intt_sharded(jnp.asarray(got), log_n, mesh))
    assert (rt == np.asarray(x)).all(), "cross-process iNTT mismatch"
    if pid == 0:
        print("cross-process NTT: OK", file=sys.stderr, flush=True)

    # --- 2) wire-sharded checker across the process boundary -------------
    mesh2 = Mesh(np.array(devs).reshape(2, n_global // 2), ("data", "rows"))
    bits = 128
    r = random.Random(3)
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = r.getrandbits(bits)
    x_v = r.getrandbits(bits) % n_v
    b = Builder(BN254_FR)
    chip = BigIntChip(b, 64, bits)
    xa = chip.assign_integer(x_v)
    na = chip.assign_integer(n_v)
    chip.assert_in_field(xa, na)
    powed = chip.pow_mod_fixed_exp(xa, 65537, na)
    chip.assert_equal_fresh(powed, chip.assign_integer(pow(x_v, 65537, n_v)))
    compiled = checker.compile_circuit(b)
    w = np.stack([checker.witness_limbs(b)] * 2)
    wc = WireShardedChecker(compiled, mesh2)
    viol = fetch(wc.check(wc.route(w)))
    assert (viol == 0).all(), f"cross-process checker violations: {viol}"
    if pid == 0:
        print("cross-process wire checker: OK", file=sys.stderr, flush=True)

    jax.distributed.shutdown()


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return

    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid)],
            cwd=REPO,
        )
        for pid in range(NPROC)
    ]
    rcs = [p.wait(timeout=1500) for p in procs]
    wall = time.time() - t0
    ok = all(rc == 0 for rc in rcs)
    result = {
        "label": "multi-process mechanism (2 procs x 4 virtual CPU devices)",
        "processes": NPROC,
        "devices_per_process": LOCAL_DEVICES,
        "checks": ["four-step NTT fwd/inv", "wire-sharded checker"],
        "ok": ok,
        "rcs": rcs,
        "wall_s": round(wall, 1),
        "note": "cross-process collectives via jax.distributed; mechanism "
        "only, no perf claim (2-core CPU host)",
    }
    print(json.dumps(result))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(result, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
