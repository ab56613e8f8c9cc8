#!/usr/bin/env python
"""Hot-kernel microbenchmarks: mont_mul (XLA rolled/unrolled + Pallas),
NTT, MSM — the VERDICT r2 #3 measurement table.

The rolled/unrolled choice is process-wide (HALO2_RSA_TPU_UNROLL read once),
so run this twice to fill both rows:

    python scripts/bench_field.py
    HALO2_RSA_TPU_UNROLL=1 python scripts/bench_field.py

Emits one JSON line: {mode, device, mont_mul_xla_el_s, mont_mul_pallas_el_s,
ntt18_s, ntt18_batch8_s, msm15_s, msm15_points_s}.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import os
import sys
import time


def timeit(fn, iters=5, warmup=1):
    for _ in range(warmup):
        _block(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        _block(fn())  # block EVERY iteration: async dispatch through the
        # axon tunnel otherwise returns futures whose completion the final
        # block does not transitively cover, yielding impossible numbers
    return (time.perf_counter() - t0) / iters


def _block(r):
    import jax

    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, r
    )


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo2_rsa_tpu.fields import pallas_mont, vecfield
    from halo2_rsa_tpu.fields.field import BN254_FR
    from halo2_rsa_tpu.fields.vecfield import _rolled
    from halo2_rsa_tpu.prover import g1_vec, msm, ntt

    fc = vecfield.consts(BN254_FR)
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    out = {
        "mode": "rolled" if _rolled() else "unrolled",
        "device": str(dev),
    }

    # --- mont_mul: batch 2^20 -------------------------------------------
    n_mm = 1 << 20
    a = jnp.asarray(rng.integers(0, 1 << 16, (n_mm, 16), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (n_mm, 16), dtype=np.uint32))
    t = timeit(lambda: vecfield.mont_mul(fc, a, b))
    out["mont_mul_xla_el_s"] = round(n_mm / t, 0)
    if jax.default_backend() == "tpu":
        t = timeit(lambda: pallas_mont.mont_mul_pallas(fc, a, b))
        out["mont_mul_pallas_el_s"] = round(n_mm / t, 0)

    # --- NTT 2^18 --------------------------------------------------------
    log_n = 18
    x = jnp.asarray(rng.integers(0, 1 << 16, (1 << log_n, 16), dtype=np.uint32))
    out["ntt18_s"] = round(timeit(lambda: ntt.ntt(x, log_n)), 4)
    xb = jnp.asarray(
        rng.integers(0, 1 << 16, (8, 1 << log_n, 16), dtype=np.uint32)
    )
    out["ntt18_batch8_s"] = round(timeit(lambda: ntt.ntt_batch(xb, log_n)), 4)

    # --- MSM 2^15 --------------------------------------------------------
    n_msm = 1 << 15
    import random as _r

    rr = _r.Random(1)
    from halo2_rsa_tpu.prover import curve

    base = [curve.g1_mul(curve.G1_GEN, i + 1) for i in range(64)]
    pts_small = g1_vec.points_to_device(base)
    # tile to n_msm on device (cheap, points need not be distinct for timing)
    reps = n_msm // 64
    pts = tuple(jnp.tile(c, (reps, 1)) for c in pts_small)
    sc = jnp.asarray(rng.integers(0, 1 << 16, (n_msm, 16), dtype=np.uint32))
    t = timeit(lambda: msm.msm(sc, pts), iters=3)
    out["msm15_s"] = round(t, 4)
    out["msm15_points_s"] = round(n_msm / t, 0)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
