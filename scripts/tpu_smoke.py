#!/usr/bin/env python
"""TPU smoke test: exercises the hot kernels ON THE REAL TPU and checks
bit-exact parity with host reference math — NTT vs host DFT, MSM vs host
Pippenger, mont_mul XLA-vs-Pallas, and one small SNARK prove+verify round
trip. This is the gate for flipping kernel-path defaults (Pallas dispatch,
unrolled chains): the CPU suite cannot see TPU-only lowering bugs.

Usage: python scripts/tpu_smoke.py          (~2-5 min warm)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(_sys.argv[0] if __name__ == "__main__" else __file__))))
from halo2_rsa_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import random
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t_all = time.perf_counter()
    from halo2_rsa_tpu.fields import pallas_mont, vecfield
    from halo2_rsa_tpu.fields.field import BN254_FR
    from halo2_rsa_tpu.prover import curve, g1_vec, msm, ntt

    assert jax.default_backend() != "cpu", "run this on the TPU"
    fc = vecfield.consts(BN254_FR)
    print("pallas_enabled:", vecfield._pallas_enabled(), flush=True)

    # --- mont_mul parity: XLA rolled vs Pallas vs host ints ----------------
    rhost = random.Random(0)
    n = 4096
    av = [rhost.randrange(BN254_FR.p) for _ in range(n)]
    bv = [rhost.randrange(BN254_FR.p) for _ in range(n)]
    a = vecfield.from_ints(fc, [int(x) for x in av], mont=False)
    b = vecfield.from_ints(fc, bv, mont=False)
    want = [int(x) * y * pow(1 << 256, -1, BN254_FR.p) % BN254_FR.p for x, y in zip(av, bv)]
    got_p = vecfield.to_ints(fc, pallas_mont.mont_mul_any(fc, a, b), mont=False)
    assert got_p == want, "pallas mont_mul parity"
    got_x = vecfield.to_ints(fc, vecfield.mont_mul(fc, a, b), mont=False)
    assert got_x == want, "dispatched mont_mul parity"
    # 3-d batch + broadcast
    a3 = a.reshape(4, 32, 32, 16)
    b1 = b.reshape(4, 32, 32, 16)[:, :1, :, :]
    r3 = vecfield._mont_mul(fc, a3, b1)
    r3f = vecfield.to_ints(fc, r3.reshape(-1, 16), mont=False)
    want3 = [
        av[i] * bv[(i // 1024) * 1024 + i % 32] * pow(1 << 256, -1, BN254_FR.p) % BN254_FR.p
        for i in range(n)
    ]
    assert r3f == want3, "broadcast batch parity"
    print("mont_mul parity OK", flush=True)

    # --- inv / pow path ----------------------------------------------------
    inv = vecfield.to_ints(fc, vecfield.inv(fc, vecfield.to_mont(fc, a[:1024])), mont=True)
    for x, y in zip(av[:16], inv[:16]):
        assert (x * y) % BN254_FR.p == (1 if x else 0), "inv parity"
    print("inv parity OK", flush=True)

    # --- NTT parity vs host DFT -------------------------------------------
    log_n = 8
    vals = [random.Random(3).randrange(BN254_FR.p) for _ in range(1 << log_n)]
    dev = ntt.ntt(vecfield.from_ints(fc, vals, mont=True), log_n)
    got = vecfield.to_ints(fc, dev, mont=True)
    want_ntt = ntt.ntt_host(vals)
    assert got == want_ntt, "NTT parity"
    back = vecfield.to_ints(fc, ntt.intt(dev, log_n), mont=True)
    assert back == vals, "iNTT round trip"
    # batched form
    dev_b = ntt.ntt_batch(vecfield.from_ints(fc, vals, mont=True)[None], log_n)
    assert vecfield.to_ints(fc, dev_b[0], mont=True) == want_ntt, "ntt_batch parity"
    print("NTT parity OK", flush=True)

    # --- MSM parity vs host ------------------------------------------------
    r = random.Random(5)
    n_msm = 512
    pts = [curve.g1_mul(curve.G1_GEN, r.randrange(1, curve.R)) for _ in range(64)]
    pts = (pts * ((n_msm + 63) // 64))[:n_msm]
    scalars = [r.randrange(curve.R) for _ in range(n_msm)]
    got_pt = msm.run_msm(scalars, pts)
    want_pt = msm.msm_host(scalars, pts)
    assert got_pt == want_pt, "MSM parity"
    # batched poly axis (exercises the vmapped chunk pipeline)
    sc3 = [[r.randrange(curve.R) for _ in range(n_msm)] for _ in range(3)]
    fr = vecfield.consts(BN254_FR)
    sc3_dev = jnp.stack([vecfield.from_ints(fr, s, mont=False) for s in sc3])
    pts_dev = g1_vec.points_to_device(pts)
    got3 = msm.msm_many_host(sc3_dev, pts_dev)
    for s, g in zip(sc3, got3):
        assert g == msm.msm_host(s, pts), "msm_many parity"
    print("MSM parity OK", flush=True)

    # --- small SNARK round trip -------------------------------------------
    from halo2_rsa_tpu.circuit import Builder, checker
    from halo2_rsa_tpu.circuit.main_gate import MainGate
    from halo2_rsa_tpu.circuit.range_chip import RangeChip
    from halo2_rsa_tpu.prover import kzg, plonk

    b_ = Builder(BN254_FR)
    mg = MainGate(b_)
    rc = RangeChip(b_)
    cells = []
    rr = random.Random(11)
    for _ in range(40):
        v = rr.randrange(1 << 8)
        cells.append(rc.assign(v, 4, 8))
    acc = cells[0]
    for c in cells[1:]:
        acc = mg.add(acc, c)
    b_.expose_public(acc)
    pub = [b_.val(acc)]
    compiled = checker.compile_circuit(b_)
    srs = kzg.setup((1 << 9) + plonk.BLIND, tau=1234)
    pk, vk = plonk.keygen(compiled, srs, k=9)
    proof = plonk.prove(pk, b_.values, pub)
    assert plonk.verify(vk, proof, pub), "SNARK round trip"
    assert not plonk.verify(vk, proof, [(pub[0] + 1) % BN254_FR.p]), "bad public must fail"
    print("SNARK round trip OK", flush=True)
    print(f"ALL TPU SMOKE CHECKS PASSED in {time.perf_counter()-t_all:.1f}s")


if __name__ == "__main__":
    main()
