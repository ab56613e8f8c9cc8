"""Mesh-sharded prove: byte-identical proofs on the virtual 8-device mesh.

VERDICT r3 gap #2: the distributed kernels must run *inside*
``plonk.prove`` (SURVEY §7 phase 6 gate — "same proofs verify" under
sharding; the reference's analog is rayon-parallel FFT/MSM inside
``create_proof``, /root/reference/benches/bench.rs:319-329).

The circuit here is a real bigint gadget (mul_mod 256 + range lookups) at
k=10, large enough that every sharded kernel takes its collective path
(four-step NTT at 2^10/2^13, points-partitioned MSM at 2^10).
"""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from halo2_rsa_tpu.bigint import BigIntChip
from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.prover import kzg, plonk

pytestmark = pytest.mark.slow  # whole-prover compiles on the CPU mesh


def _build_circuit():
    bits = 256
    rng = random.Random(3)
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)
    a_v = rng.getrandbits(bits) % n_v
    b_v = rng.getrandbits(bits) % n_v
    b = Builder(BN254_FR)
    chip = BigIntChip(b, 64, bits)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    res = chip.mul_mod(a, bb, n)
    ans = chip.assign_integer((a_v * b_v) % n_v)
    chip.assert_equal_fresh(res, ans)
    b.expose_public(res.limbs[0])
    return b


def test_mesh_prove_byte_identical():
    from jax.sharding import Mesh

    b = _build_circuit()
    compiled = checker.compile_circuit(b)
    k = 10
    srs = kzg.setup((1 << k) + plonk.BLIND, tau=4242)
    pk, vk = plonk.keygen(compiled, srs, k=k)
    pub = [b.values[b.instance[0]]]

    proof_local = plonk.prove(pk, b.values, pub, rng=random.Random(99))
    assert plonk.verify(vk, proof_local, pub)

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs.reshape(8), ("rows",))
    proof_mesh = plonk.prove(pk, b.values, pub, rng=random.Random(99), mesh=mesh)
    assert proof_mesh == proof_local, "mesh prove must be byte-identical"

    # and an independently-blinded mesh proof still verifies
    proof2 = plonk.prove(pk, b.values, pub, mesh=mesh)
    assert plonk.verify(vk, proof2, pub)
    assert not plonk.verify(vk, proof2, [(pub[0] + 1) % BN254_FR.p])
