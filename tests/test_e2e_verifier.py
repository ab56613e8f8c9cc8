"""End-to-end hash+verify tests with real RSA keypairs.

Mirror of the reference's lib.rs test family (src/lib.rs:266-371): generate a
real RSA keypair, pkcs1v15-sign a random 128-byte message (the reference uses
the Rust ``rsa`` crate; we use python-cryptography), run the full
SHA256 -> verify circuit, expose n limbs ++ hash bytes as public inputs.
Cases: 2048-bit valid, 1024-bit valid, wrong-key fails, wrong-message fails.
"""

import random

import pytest
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import padding, rsa

from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.rsa import DEFAULT_E, RSAChip, RSAPubE, RSAPublicKey, RSASignature
from halo2_rsa_tpu.rsa.verifier import RSASignatureVerifier
from halo2_rsa_tpu.sha256 import Sha256Chip

EXP_LIMB_BITS = 5
LIMB_WIDTH = 64


def _keygen_and_sign(bits, msg):
    key = rsa.generate_private_key(public_exponent=DEFAULT_E, key_size=bits)
    n = key.public_key().public_numbers().n
    sig = key.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    return n, int.from_bytes(sig, "big")


def _verifier_circuit(bits, n, sig_int, msg, expect_valid=True):
    b = Builder(BN254_FR)
    rsa_chip = RSAChip(b, bits, EXP_LIMB_BITS)
    sha_chip = Sha256Chip(b)
    verifier = RSASignatureVerifier(rsa_chip, sha_chip)
    pk = rsa_chip.assign_public_key(RSAPublicKey(n, RSAPubE.fix(DEFAULT_E)))
    sig = rsa_chip.assign_signature(RSASignature(sig_int))
    is_valid, hashed_bytes = verifier.verify_pkcs1v15_signature(pk, msg, sig)
    rsa_chip.main_gate.assert_one(is_valid)
    # public inputs: n limbs ++ hash bytes (lib.rs:354-356, rsa_example.rs:113-139)
    for limb in pk.n.limbs:
        b.expose_public(limb)
    for cell in hashed_bytes:
        b.expose_public(cell)
    import hashlib

    want_hash = hashlib.sha256(msg).digest()
    public_inputs = [
        (n >> (LIMB_WIDTH * i)) & ((1 << LIMB_WIDTH) - 1)
        for i in range(bits // LIMB_WIDTH)
    ] + list(want_hash)
    return checker.run(b, public_inputs)


def test_e2e_2048_valid():
    rng = random.Random(1)
    msg = bytes(rng.randrange(256) for _ in range(128))
    n, sig = _keygen_and_sign(2048, msg)
    assert _verifier_circuit(2048, n, sig, msg)["ok"]


def test_e2e_1024_valid():
    rng = random.Random(2)
    msg = bytes(rng.randrange(256) for _ in range(128))
    n, sig = _keygen_and_sign(1024, msg)
    assert _verifier_circuit(1024, n, sig, msg)["ok"]


def test_e2e_wrong_key_rejected():
    """Signature from a different key must fail (lib.rs:541)."""
    rng = random.Random(3)
    msg = bytes(rng.randrange(256) for _ in range(128))
    _, sig = _keygen_and_sign(1024, msg)
    other_n, _ = _keygen_and_sign(1024, msg)
    assert not _verifier_circuit(1024, other_n, sig % other_n, msg)["ok"]


def test_e2e_wrong_message_rejected():
    """Signature over a different message must fail (lib.rs:626)."""
    rng = random.Random(4)
    msg = bytes(rng.randrange(256) for _ in range(128))
    other = bytes(rng.randrange(256) for _ in range(128))
    n, sig = _keygen_and_sign(1024, other)
    assert not _verifier_circuit(1024, n, sig, msg)["ok"]


def test_e2e_dynamic_sha_one_shape_two_lengths():
    """Full RSA+SHA composition in dynamic mode: 64- and 100-byte messages
    produce the SAME trace (one vk) and both verify (lib.rs:308-320 parity)."""
    rng = random.Random(5)
    max_len = 100
    sigs = []
    for mlen in (64, 100):
        msg = bytes(rng.randrange(256) for _ in range(mlen))
        n, sig_int = _keygen_and_sign(1024, msg)
        b = Builder(BN254_FR)
        rsa_chip = RSAChip(b, 1024, EXP_LIMB_BITS)
        verifier = RSASignatureVerifier(rsa_chip, Sha256Chip(b))
        pk = rsa_chip.assign_public_key(RSAPublicKey(n, RSAPubE.fix(DEFAULT_E)))
        sig = rsa_chip.assign_signature(RSASignature(sig_int))
        is_valid, hashed_bytes = verifier.verify_pkcs1v15_signature(
            pk, msg, sig, max_len=max_len
        )
        rsa_chip.main_gate.assert_one(is_valid)
        for limb in pk.n.limbs:
            b.expose_public(limb)
        for cell in hashed_bytes:
            b.expose_public(cell)
        import hashlib

        pub = [
            (n >> (LIMB_WIDTH * i)) & ((1 << LIMB_WIDTH) - 1)
            for i in range(1024 // LIMB_WIDTH)
        ] + list(hashlib.sha256(msg).digest())
        assert checker.run(b, pub)["ok"], f"dynamic e2e fails at len={mlen}"
        sigs.append((tuple(b.gate_idx), tuple(b.gate_coef), tuple(b.lookups)))
    assert sigs[0] == sigs[1], "dynamic SHA e2e must share one trace shape"
