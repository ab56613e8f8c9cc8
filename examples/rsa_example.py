#!/usr/bin/env python
"""Full pkcs1v15 + SHA-256 verification circuit, 2048-bit key.

Parity with the reference's example driver
(/root/reference/examples/rsa_example.rs:29-213): generate a real RSA-2048
keypair, sign a random 128-byte message, synthesize the hash-then-verify
circuit, expose public inputs = 32 modulus limbs ++ 32 digest bytes, and run
the MockProver-analog constraint check (rsa_example.rs runs MockProver at
k=18). Pass --prove to additionally run the real KZG prover end-to-end.

Usage: python examples/rsa_example.py [--prove]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import random
import sys
import time

from halo2_rsa_tpu.pipelines import Pkcs1v15Circuit, sign_fixture


def main():
    bits = 2048
    rng = random.Random(0)
    msg = bytes(rng.randrange(256) for _ in range(128))
    print(f"generating RSA-{bits} keypair + signature...")
    n, sig = sign_fixture(bits, msg)

    t0 = time.perf_counter()
    circ = Pkcs1v15Circuit.build(bits, n, sig, msg=msg)
    print(
        f"synthesized in {time.perf_counter()-t0:.1f}s: {circ.builder.stats()}"
    )

    t0 = time.perf_counter()
    report = circ.check()
    print(f"constraint check in {time.perf_counter()-t0:.1f}s: {report}")
    assert report["ok"], "verification circuit must be satisfied"

    if "--prove" in sys.argv:
        from halo2_rsa_tpu.prover import kzg, plonk

        compiled = circ.compile()
        k = max(compiled.num_gates, compiled.num_witness // 5 + 1).bit_length()
        print(f"k={k}: SRS setup + keygen...")
        t0 = time.perf_counter()
        srs = kzg.setup((1 << k) + plonk.BLIND, tau=None)
        pk, vk = plonk.keygen(compiled, srs, k=k)
        print(f"  {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        proof = plonk.prove(pk, circ.builder.values, circ.public_inputs)
        print(f"proved in {time.perf_counter()-t0:.1f}s ({len(proof)} bytes)")
        t0 = time.perf_counter()
        assert plonk.verify(vk, proof, circ.public_inputs)
        print(f"verified in {time.perf_counter()-t0:.1f}s")
    print("OK")


if __name__ == "__main__":
    main()
