"""SHA-256 gadget tests vs hashlib, positive and negative."""

import hashlib
import random

from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.sha256 import Sha256Chip


def _digest_circuit(msg: bytes):
    b = Builder(BN254_FR)
    chip = Sha256Chip(b)
    words, byte_cells, msg_cells = chip.digest(msg)
    return b, words, byte_cells, msg_cells


def _check_digest(msg: bytes):
    b, words, byte_cells, _ = _digest_circuit(msg)
    want = hashlib.sha256(msg).digest()
    got = bytes(b.val(c) for c in byte_cells)
    assert got == want, f"digest mismatch for {msg!r}"
    # word parity too
    for j in range(8):
        assert b.val(words[j]) == int.from_bytes(want[4 * j : 4 * j + 4], "big")
    assert checker.run(b)["ok"]


def test_empty():
    _check_digest(b"")


def test_abc():
    _check_digest(b"abc")


def test_55_bytes_boundary():
    _check_digest(bytes(range(55)))


def test_56_bytes_two_blocks():
    _check_digest(bytes(range(56)))


def test_128_bytes():
    rng = random.Random(0)
    _check_digest(bytes(rng.randrange(256) for _ in range(128)))


def test_tampered_digest_rejected():
    """Flipping a witness bit of the first message byte must violate gates."""
    b, words, byte_cells, msg_cells = _digest_circuit(b"abc")
    # tamper the composed message byte cell
    b.values[msg_cells[0].idx] ^= 1
    assert not checker.run(b)["ok"]


# --- dynamic-length mode (one circuit shape / one vk for all lengths) -------


def _dynamic_circuit(msg: bytes, max_len: int):
    b = Builder(BN254_FR)
    chip = Sha256Chip(b)
    words, byte_cells, msg_cells, len_cell = chip.digest_dynamic(msg, max_len)
    return b, words, byte_cells, msg_cells, len_cell


def _trace_signature(b):
    return (tuple(b.gate_idx), tuple(b.gate_coef), tuple(b.lookups))


def test_dynamic_digest_correct_and_shape_stable():
    """64- and 100-byte messages (plus the empty edge case) under
    max_len=100 produce the SAME trace (same gates, coefficients, lookups —
    hence the same vk after keygen, which is a pure function of the trace)
    and correct digests (vs hashlib), all constraint-checked."""
    max_len = 100  # 2 blocks; 64-byte msg needs 2, 100-byte needs 2, "" needs 1
    sigs = []
    rng = random.Random(4)
    for msg in (b"", bytes(rng.randrange(256) for _ in range(64)),
                bytes(rng.randrange(256) for _ in range(100))):
        b, words, byte_cells, _, _ = _dynamic_circuit(msg, max_len)
        want = hashlib.sha256(msg).digest()
        got = bytes(b.val(c) for c in byte_cells)
        assert got == want, f"dynamic digest mismatch for len={len(msg)}"
        assert checker.run(b)["ok"], f"constraints fail for len={len(msg)}"
        sigs.append(_trace_signature(b))
    assert all(s == sigs[0] for s in sigs), (
        "trace shape must be identical across message lengths (one vk)"
    )


def test_dynamic_padding_tamper_rejected():
    """Forged padding/length witnesses must violate constraints."""
    msg = b"abcdef"
    max_len = 20  # one block — cheap builds for the three tamper cases

    # 1. wrong 0x80 marker byte (padded byte at position len(msg))
    b1, _, _, mc1, _ = _dynamic_circuit(msg, max_len)
    assert checker.run(b1)["ok"]
    b1.values[mc1[len(msg)].idx] = 0x00
    assert not checker.run(b1)["ok"], "wrong 0x80 byte must be rejected"

    # 2. lie about the length (mask unchanged)
    b2, _, _, _, len2 = _dynamic_circuit(msg, max_len)
    b2.values[len2.idx] = len(msg) + 1
    assert not checker.run(b2)["ok"], "inconsistent length must be rejected"

    # 3. nonzero byte in the zero-padding region
    b3, _, _, mc3, _ = _dynamic_circuit(msg, max_len)
    b3.values[mc3[len(msg) + 3].idx] = 7
    assert not checker.run(b3)["ok"], "dirty padding region must be rejected"


import pytest


@pytest.mark.slow
def test_dynamic_same_vk_snark_roundtrip():
    """SNARK-level: two message lengths proved under the SAME pk/vk
    (halo2-dynamic-sha256 capability, /root/reference/src/lib.rs:308-320)."""
    from halo2_rsa_tpu.prover import kzg, plonk

    max_len = 4  # single block; small enough for a CPU round trip
    msgs = [b"ab", b"abcd"]
    builders = []
    for msg in msgs:
        b, words, byte_cells, _, _ = _dynamic_circuit(msg, max_len)
        for c in byte_cells[:4]:
            b.expose_public(c)
        builders.append(b)
    assert _trace_signature(builders[0]) == _trace_signature(builders[1])

    compiled = checker.compile_circuit(builders[0])
    k = max(2, (compiled.num_gates + 40).bit_length())
    srs = kzg.setup((1 << k) + plonk.BLIND, tau=97531)
    pk, vk = plonk.keygen(compiled, srs, k=k)
    for msg, b in zip(msgs, builders):
        pub = list(hashlib.sha256(msg).digest()[:4])
        proof = plonk.prove(pk, b.values, pub)
        assert plonk.verify(vk, proof, pub), f"len={len(msg)} under shared vk"
        assert not plonk.verify(vk, proof, [pub[0] ^ 1] + pub[1:])
