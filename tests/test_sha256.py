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
