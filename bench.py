#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line.

Round-1 metric: device-side constraint-check throughput for batched 2048-bit
mul_mod instances (BASELINE.md config #1, "BigIntChip 2048-bit mul_mod
witness gen + constraint check"). The trace is built once (static shape);
witnesses for B instances are checked on-device via the sharded checker.

The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
as 1.0 by convention until a measured Rust MockProver baseline exists.
"""

import json
import random
import time

import numpy as np


def main():
    import jax

    from halo2_rsa_tpu.bigint import BigIntChip
    from halo2_rsa_tpu.circuit import Builder, checker
    from halo2_rsa_tpu.fields import BN254_FR
    from halo2_rsa_tpu.parallel import ShardedChecker
    from jax.sharding import Mesh

    bits = 2048
    B = 8  # instances per batch

    rng = random.Random(0)
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)

    def build(seed):
        r = random.Random(seed)
        a_v = r.getrandbits(bits) % n_v
        b_v = r.getrandbits(bits) % n_v
        b = Builder(BN254_FR)
        chip = BigIntChip(b, 64, bits)
        a = chip.assign_integer(a_v)
        bb = chip.assign_integer(b_v)
        n = chip.assign_integer(n_v)
        res = chip.mul_mod(a, bb, n)
        ans = chip.assign_integer((a_v * b_v) % n_v)
        chip.assert_equal_fresh(res, ans)
        return b

    builders = [build(s) for s in range(B)]
    compiled = checker.compile_circuit(builders[0])
    w = np.stack([checker.witness_limbs(bld) for bld in builders])

    devs = np.array(jax.devices())
    mesh = Mesh(devs.reshape(1, len(devs)), ("data", "rows"))
    sc = ShardedChecker(compiled, mesh)
    w_dev = sc.shard_witness(w)

    # warmup (compile)
    viol = sc.check(w_dev)
    assert (viol == 0).all(), f"bench circuit unexpectedly violated: {viol}"

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        viol = sc.check(w_dev)
    dt = time.perf_counter() - t0
    checks_per_s = B * iters / dt

    print(
        json.dumps(
            {
                "metric": "mulmod2048_constraint_checks_per_s",
                "value": round(checks_per_s, 2),
                "unit": "mul_mod instances/s",
                "vs_baseline": 1.0,
                "detail": {
                    "gate_rows": int(compiled.num_gates),
                    "lookups": int(compiled.num_lookups),
                    "witness_cells": int(compiled.num_witness),
                    "batch": B,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
