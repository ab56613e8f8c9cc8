"""Pipeline surface tests: Pkcs1v15Circuit build paths + witness-free keygen.

Covers the reference's ``without_witness`` keygen pattern
(/root/reference/src/lib.rs:63-70, 114-120; benches/bench.rs:228-239):
keygen must be possible without knowing a valid signature, and a real
witness proven afterwards must verify under that key.
"""

import random

import pytest

import numpy as np

from halo2_rsa_tpu.bigint import BigIntChip
from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.pipelines import Pkcs1v15Circuit, sign_fixture
from halo2_rsa_tpu.prover import kzg, plonk
from halo2_rsa_tpu.rsa import RSAPublicKey, RSASignature


def _trace_signature(circ: Pkcs1v15Circuit):
    c = circ.compile()
    return (
        c.num_witness,
        c.gate_idx.tobytes(),
        c.gate_coef_id.tobytes(),
        c.coef_table.tobytes(),
        tuple((bits, idx.tobytes()) for bits, idx in c.lookup_groups),
        c.instance_idx.tobytes(),
    )


def test_without_witness_shape_stable_prehashed():
    """Dummy-built circuit has the exact trace of a real instance (SHA off)."""
    bits = 512
    rng = random.Random(11)
    n_v = 0
    while n_v.bit_length() != bits or n_v % 2 == 0:
        n_v = rng.getrandbits(bits)
    sig_v = rng.getrandbits(bits) % n_v
    hashed = rng.getrandbits(256)
    real = Pkcs1v15Circuit.build(bits, n_v, sig_v, hashed_msg=hashed)
    dummy = Pkcs1v15Circuit.without_witness(bits)
    assert _trace_signature(dummy) == _trace_signature(real)


def test_without_witness_shape_stable_sha256():
    """Same-shape guarantee for the SHA-256 composition path."""
    bits = 1024
    msg = bytes(range(48))
    n_v, sig_v = sign_fixture(bits, msg)
    real = Pkcs1v15Circuit.build(bits, n_v, sig_v, msg=msg)
    dummy = Pkcs1v15Circuit.without_witness(bits, msg_len=len(msg))
    assert _trace_signature(dummy) == _trace_signature(real)


@pytest.mark.slow
def test_keygen_from_dummy_then_prove_real():
    """keygen on a dummy-witness trace; a real witness proves under it."""
    rng = random.Random(5)
    bits = 128

    def build(n_v, a_v, b_v):
        b = Builder(BN254_FR)
        chip = BigIntChip(b, 64, bits)
        a = chip.assign_integer(a_v)
        bb = chip.assign_integer(b_v)
        n = chip.assign_integer(n_v)
        res = chip.mul_mod(a, bb, n)
        for limb in res.limbs:
            b.expose_public(limb)
        return b

    # keygen path: dummy values in the without_witness style (n full-bit odd)
    dummy = build((1 << bits) - 1, 0, 0)
    compiled = checker.compile_circuit(dummy)
    k = 10
    srs = kzg.setup((1 << k) + 8, tau=24680)
    pk, vk = plonk.keygen(compiled, srs, k=k)

    # prover path: real values, same shape
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)
    a_v = rng.getrandbits(bits) % n_v
    b_v = rng.getrandbits(bits) % n_v
    real = build(n_v, a_v, b_v)
    compiled_real = checker.compile_circuit(real)
    assert compiled.gate_idx.tobytes() == compiled_real.gate_idx.tobytes()
    assert compiled.coef_table.tobytes() == compiled_real.coef_table.tobytes()

    want = (a_v * b_v) % n_v
    pub = [(want >> (64 * i)) & ((1 << 64) - 1) for i in range(2)]
    proof = plonk.prove(pk, real.values, pub)
    assert plonk.verify(vk, proof, pub)


def test_rsa_types_without_witness():
    pk = RSAPublicKey.without_witness(1024)
    assert pk.n.bit_length() == 1024 and pk.n % 2 == 1
    assert RSASignature.without_witness().c == 0


def test_pkcs1v15_circuit_check_valid():
    """The pipeline's MockProver-analog check on a real fixture."""
    bits = 1024
    msg = b"pipeline check"
    n_v, sig_v = sign_fixture(bits, msg)
    circ = Pkcs1v15Circuit.build(bits, n_v, sig_v, msg=msg)
    rep = circ.check()
    assert rep["ok"], rep
