#!/usr/bin/env python
"""Multi-device scaling table: four-step sharded NTT + wire-sharded checker.

Runs on the virtual CPU mesh by default (validates the mechanism and records
the 1/2/4/8-device table VERDICT r2 #5 asks for; real scaling needs real
chips — wall-clock on a 2-core host measures correctness + overhead, not
speedup). Usage:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py [log_n]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import random
import sys
import time

# force the virtual CPU mesh even when the ambient env pins the tunneled
# TPU (sitecustomize initializes the axon platform before env vars apply)
_os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from halo2_rsa_tpu.bigint import BigIntChip
    from halo2_rsa_tpu.circuit import Builder, checker
    from halo2_rsa_tpu.fields import BN254_FR, vecfield
    from halo2_rsa_tpu.parallel import WireShardedChecker, ntt_sharded
    from halo2_rsa_tpu.prover import ntt

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    fr = vecfield.consts(BN254_FR)
    rng = random.Random(0)
    devs = np.array(jax.devices())
    max_d = len(devs)

    x_np = vecfield.from_ints_np(
        fr, [rng.randrange(BN254_FR.p) for _ in range(1 << log_n)], mont=True
    )
    x = jnp.asarray(x_np)
    want = np.asarray(ntt.ntt(x, log_n))

    # mul_mod circuit batch for the checker
    bits = 1024
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)

    def build(seed):
        r = random.Random(seed)
        a_v = r.getrandbits(bits) % n_v
        b_v = r.getrandbits(bits) % n_v
        b = Builder(BN254_FR)
        chip = BigIntChip(b, 64, bits)
        res = chip.mul_mod(
            chip.assign_integer(a_v), chip.assign_integer(b_v), chip.assign_integer(n_v)
        )
        ans = chip.assign_integer((a_v * b_v) % n_v)
        chip.assert_equal_fresh(res, ans)
        return b

    builders = [build(s) for s in range(8)]
    compiled = checker.compile_circuit(builders[0])
    w = np.stack([checker.witness_limbs(bld) for bld in builders])

    rows = []
    d = 1
    while d <= max_d:
        mesh = Mesh(devs[:d].reshape(d), ("rows",))
        got = np.asarray(ntt_sharded(x, log_n, mesh))
        assert (got == want).all(), f"sharded NTT mismatch at D={d}"
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(ntt_sharded(x, log_n, mesh))
        ntt_s = (time.perf_counter() - t0) / 3

        mesh2 = Mesh(devs[:d].reshape(1, d), ("data", "rows"))
        wc = WireShardedChecker(compiled, mesh2)
        routed = wc.route(w)
        viol = wc.check(routed)
        assert (viol == 0).all()
        t0 = time.perf_counter()
        for _ in range(3):
            viol = wc.check(routed)  # np.asarray inside check already blocks
        dt = (time.perf_counter() - t0) / 3
        # per-device witness bytes: wires + lookups, sharded 1/D along rows
        wire_bytes = sum(int(np.prod(c.shape)) * 4 for c in routed[0:1]) // d
        rows.append(
            {
                "devices": d,
                "ntt_s": round(ntt_s, 4),
                "checker_s": round(dt, 4),
                "checker_inst_s": round(len(builders) / dt, 1),
                "wire_bytes_per_dev": wire_bytes,
            }
        )
        d *= 2

    print(json.dumps({"log_n": log_n, "backend": jax.default_backend(), "rows": rows}))


if __name__ == "__main__":
    main()
