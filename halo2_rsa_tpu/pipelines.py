"""High-level end-to-end pipelines (the examples/bench surface).

Mirrors the reference's two benchmark circuit families
(/root/reference/benches/bench.rs:46-347):

* ``Pkcs1v15Circuit(sha256=False)`` — signature verification on a pre-hashed
  message (the reference's only *enabled* bench: 1024-bit key, k=15,
  bench.rs:369-377).
* ``Pkcs1v15Circuit(sha256=True)`` — full SHA-256 + verify composition
  (bench.rs:349-367 configs; examples/rsa_example.rs parity), public inputs
  = n limbs ++ digest bytes.

Each instance can be (a) checked with the vectorized MockProver analog and
(b) proven/verified with the PLONK-KZG backend.
"""

from __future__ import annotations

import dataclasses
import hashlib

from .circuit import Builder, checker
from .fields import BN254_FR
from .rsa import DEFAULT_E, RSAChip, RSAPubE, RSAPublicKey, RSASignature
from .rsa.verifier import RSASignatureVerifier
from .sha256 import Sha256Chip

EXP_LIMB_BITS = 5
LIMB_WIDTH = 64


@dataclasses.dataclass
class Pkcs1v15Circuit:
    """One synthesized pkcs1v15 verification instance."""

    builder: Builder
    public_inputs: list
    bits: int

    @classmethod
    def build(
        cls,
        bits: int,
        n: int,
        sig: int,
        msg: bytes | None = None,
        hashed_msg: int | None = None,
        expose_public: bool = True,
    ) -> "Pkcs1v15Circuit":
        """With ``msg``: full SHA-256 + verify. With ``hashed_msg``: verify a
        pre-hashed digest (the SHA-disabled bench shape, bench.rs:160-167)."""
        b = Builder(BN254_FR)
        rsa_chip = RSAChip(b, bits, EXP_LIMB_BITS)
        pk = rsa_chip.assign_public_key(RSAPublicKey(n, RSAPubE.fix(DEFAULT_E)))
        sig_a = rsa_chip.assign_signature(RSASignature(sig))
        pubs = []
        if msg is not None:
            verifier = RSASignatureVerifier(rsa_chip, Sha256Chip(b))
            is_valid, hashed_bytes = verifier.verify_pkcs1v15_signature(pk, msg, sig_a)
            rsa_chip.main_gate.assert_one(is_valid)
            if expose_public:
                for limb in pk.n.limbs:
                    b.expose_public(limb)
                for cell in hashed_bytes:
                    b.expose_public(cell)
                digest = hashlib.sha256(msg).digest()
                pubs = _n_limbs(n, bits) + list(digest)
        else:
            assert hashed_msg is not None
            hashed = rsa_chip.bigint_chip.assign_integer(hashed_msg, num_limbs=4)
            is_valid = rsa_chip.verify_pkcs1v15_signature(pk, hashed, sig_a)
            rsa_chip.main_gate.assert_one(is_valid)
            if expose_public:
                for limb in pk.n.limbs:
                    b.expose_public(limb)
                for limb in hashed.limbs:
                    b.expose_public(limb)
                pubs = _n_limbs(n, bits) + _n_limbs(hashed_msg, 256)
        return cls(builder=b, public_inputs=pubs, bits=bits)

    @classmethod
    def without_witness(
        cls, bits: int, msg_len: int | None = None, expose_public: bool = True
    ) -> "Pkcs1v15Circuit":
        """Witness-free instance for keygen — same trace shape as any real
        instance of the same (bits, msg_len) config, built from dummy values
        (the ``Circuit::default()``/``without_witness`` keygen pattern,
        /root/reference/benches/bench.rs:228-239, src/lib.rs:63-70)."""
        dummy_pk = RSAPublicKey.without_witness(bits)
        if msg_len is not None:
            return cls.build(
                bits, dummy_pk.n, 0, msg=b"\x00" * msg_len, expose_public=expose_public
            )
        return cls.build(bits, dummy_pk.n, 0, hashed_msg=0, expose_public=expose_public)

    def check(self) -> dict:
        """MockProver-analog constraint check."""
        return checker.run(self.builder, self.public_inputs)

    def compile(self):
        return checker.compile_circuit(self.builder)


def _n_limbs(x: int, bits: int) -> list:
    return [(x >> (LIMB_WIDTH * i)) & ((1 << LIMB_WIDTH) - 1) for i in range(bits // LIMB_WIDTH)]


def sign_fixture(bits: int, msg: bytes):
    """Real RSA keypair + pkcs1v15/SHA-256 signature (test-vector oracle,
    the python-cryptography analog of the reference's use of the rsa crate)."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding as cpad, rsa as crsa

    key = crsa.generate_private_key(public_exponent=DEFAULT_E, key_size=bits)
    n = key.public_key().public_numbers().n
    sig = int.from_bytes(key.sign(msg, cpad.PKCS1v15(), hashes.SHA256()), "big")
    return n, sig
