#!/usr/bin/env python
"""Hot-kernel microbenchmarks: mont_mul (XLA rolled / Pallas), NTT, MSM.

Timing methodology (important on tunneled TPU setups): ``block_until_ready``
on this environment's remote relay returns before execution completes, so
naive per-call timing measures only dispatch latency (~25 ms round trip).
Every measurement here therefore (a) builds a DEPENDENCY CHAIN of k
applications so device work serializes, (b) forces one host readback of a
reduction at the end, and (c) subtracts nothing: the single round-trip
latency is amortized over k chained calls.

Run matrix:
    python scripts/bench_field.py                        # pallas (TPU default)
    HALO2_RSA_TPU_PALLAS=0 python scripts/bench_field.py # XLA rolled path

Emits one JSON line.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo2_rsa_tpu.fields import pallas_mont, vecfield
    from halo2_rsa_tpu.fields.field import BN254_FR
    from halo2_rsa_tpu.prover import curve, g1_vec, msm, ntt

    fc = vecfield.consts(BN254_FR)
    rng = np.random.default_rng(0)
    out = {
        "mode": "pallas" if vecfield._pallas_enabled() else (
            "rolled" if vecfield._rolled() else "unrolled"),
        "device": str(jax.devices()[0]),
    }

    def readback(x):
        if isinstance(x, tuple):
            x = x[0]
        return int(jnp.sum(x))

    def chain_time(fn, x0, k=8):
        """fn: x -> x (same shape/dtype). Warm once, then k chained calls
        with one readback."""
        _ = readback(fn(x0))
        t0 = time.perf_counter()
        x = x0
        for _i in range(k):
            x = fn(x)
        _ = readback(x)
        return (time.perf_counter() - t0) / k

    # --- mont_mul: batch 2^20 -------------------------------------------
    n_mm = 1 << 20
    a = jnp.asarray(rng.integers(0, 1 << 16, (n_mm, 16), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (n_mm, 16), dtype=np.uint32))
    t = chain_time(lambda x: vecfield.mont_mul(fc, x, b), a)
    out["mont_mul_el_s"] = round(n_mm / t, 0)
    out["mont_mul20_ms"] = round(t * 1e3, 2)
    if jax.default_backend() != "cpu":
        t = chain_time(lambda x: pallas_mont.mont_mul_pallas(fc, x, b), a)
        out["mont_mul_pallas_el_s"] = round(n_mm / t, 0)

    # --- NTT 2^18, single and batch-8 -----------------------------------
    log_n = 18
    x18 = jnp.asarray(rng.integers(0, 1 << 16, (1 << log_n, 16), dtype=np.uint32))
    t = chain_time(lambda x: ntt.ntt(x, log_n), x18, k=4)
    out["ntt18_s"] = round(t, 4)
    xb = jnp.asarray(rng.integers(0, 1 << 16, (8, 1 << log_n, 16), dtype=np.uint32))
    t = chain_time(lambda x: ntt.ntt_batch(x, log_n), xb, k=4)
    out["ntt18_batch8_s"] = round(t, 4)
    out["ntt18_batch8_per_poly_s"] = round(t / 8, 4)

    # --- MSM 2^15 ---------------------------------------------------------
    n_msm = 1 << 15
    base = [curve.g1_mul(curve.G1_GEN, i + 1) for i in range(64)]
    pts_small = g1_vec.points_to_device(base)
    reps = n_msm // 64
    pts = tuple(jnp.tile(c, (reps, 1)) for c in pts_small)
    sc = jnp.asarray(rng.integers(0, 1 << 16, (n_msm, 16), dtype=np.uint32))
    # chain: feed the (reduced mod 2^16) x-coord back in as a scalar column
    def msm_step(s):
        r = msm.msm(s, pts)
        return jnp.bitwise_xor(s, jnp.broadcast_to(r[0][None, :], s.shape) & 1)
    t = chain_time(msm_step, sc, k=4)
    out["msm15_s"] = round(t, 4)
    out["msm15_points_s"] = round(n_msm / t, 0)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
