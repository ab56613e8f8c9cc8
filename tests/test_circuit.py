"""Tests for the constraint layer: builder, main gate, range chip, checker.

Follows the reference's positive/negative pair pattern (SURVEY.md §4): every
op gets a satisfied circuit and a deliberately-violated one that the checker
must reject.
"""

import random

import pytest

from halo2_rsa_tpu.circuit import Builder, MainGate, RangeChip, checker
from halo2_rsa_tpu.fields import BN254_FR, PASTA_FP


@pytest.fixture(params=[BN254_FR, PASTA_FP], ids=lambda f: f.name)
def field(request):
    return request.param


def _fresh(field):
    b = Builder(field)
    return b, MainGate(b)


def test_arith_ops_satisfied(field):
    b, mg = _fresh(field)
    rng = random.Random(0)
    p = field.p
    for _ in range(20):
        x, y = rng.randrange(p), rng.randrange(p)
        a = mg.assign_value(x)
        c = mg.assign_value(y)
        s = mg.add(a, c)
        assert b.val(s) == (x + y) % p
        d = mg.sub(a, c)
        assert b.val(d) == (x - y) % p
        m = mg.mul(a, c)
        assert b.val(m) == (x * y) % p
        ma = mg.mul_add(a, c, s)
        assert b.val(ma) == (x * y + x + y) % p
        k = rng.randrange(p)
        assert b.val(mg.add_constant(a, k)) == (x + k) % p
        assert b.val(mg.add_with_constant(a, c, k)) == (x + y + k) % p
        assert b.val(mg.neg(a)) == (-x) % p
    assert checker.run(b)["ok"]


def test_logic_ops_satisfied(field):
    b, mg = _fresh(field)
    one = mg.assign_bit(1)
    zero = mg.assign_bit(0)
    assert b.val(mg.and_(one, zero)) == 0
    assert b.val(mg.or_(one, zero)) == 1
    assert b.val(mg.not_(one)) == 0
    x = mg.assign_value(42)
    y = mg.assign_value(42)
    z = mg.assign_value(43)
    assert b.val(mg.is_equal(x, y)) == 1
    assert b.val(mg.is_equal(x, z)) == 0
    assert b.val(mg.is_zero(mg.sub(x, y))) == 1
    assert b.val(mg.is_zero(x)) == 0
    sel = mg.select(x, z, one)
    assert b.val(sel) == 42
    sel2 = mg.select(x, z, zero)
    assert b.val(sel2) == 43
    mg.assert_one(one)
    mg.assert_zero(zero)
    mg.assert_equal(x, y)
    assert checker.run(b)["ok"]


def test_to_bits(field):
    b, mg = _fresh(field)
    v = 0b1011001
    a = mg.assign_value(v)
    bits = mg.to_bits(a, 8)
    got = [b.val(c) for c in bits]
    assert got == [(v >> i) & 1 for i in range(8)]
    assert checker.run(b)["ok"]


def test_assert_violation_detected(field):
    b, mg = _fresh(field)
    x = mg.assign_value(5)
    mg.assert_zero(x)  # 5 != 0 — must be rejected
    res = checker.run(b)
    assert not res["ok"]
    assert res["gate_violations"] == 1


def test_tampered_witness_detected(field):
    b, mg = _fresh(field)
    x = mg.assign_value(3)
    y = mg.assign_value(4)
    out = mg.mul(x, y)
    mg.assert_equal(out, mg.assign_constant(12))
    # tamper: claim 3*4 == 13
    b.values[out.idx] = 13
    res = checker.run(b)
    assert not res["ok"]


def test_bad_bit_detected(field):
    b, mg = _fresh(field)
    cell = mg.assign_bit(1)
    b.values[cell.idx] = 2  # not boolean
    assert not checker.run(b)["ok"]


def test_range_chip(field):
    b, _ = _fresh(field)
    rc = RangeChip(b)
    cell = rc.assign(0xDEAD, 8, 16)
    assert b.val(cell) == 0xDEAD
    cell64 = rc.assign((1 << 64) - 1, 8, 64)
    assert b.val(cell64) == (1 << 64) - 1
    # non-divisible width: 2 sublimbs of 8 + overflow of 4
    cell20 = rc.assign(0xFFFFF, 8, 20)
    assert b.val(cell20) == 0xFFFFF
    assert checker.run(b)["ok"]


def test_range_violation_detected(field):
    b, _ = _fresh(field)
    rc = RangeChip(b)
    cell = rc.assign(200, 8, 8)
    # tamper the sublimb itself (the looked-up cell) so the lookup fails
    b.values[cell.idx - 1] = 300  # sublimb cell
    b.values[cell.idx] = 300
    res = checker.run(b)
    assert not res["ok"]
    assert res["lookup_violations"] >= 1


def test_public_inputs(field):
    b, mg = _fresh(field)
    x = mg.assign_value(7)
    b.expose_public(x)
    assert checker.run(b, [7])["ok"]
    assert not checker.run(b, [8])["ok"]


def test_constant_dedup(field):
    b, mg = _fresh(field)
    a = mg.assign_constant(9)
    c = mg.assign_constant(9)
    assert a.idx == c.idx
    assert checker.run(b)["ok"]


def test_explain_names_failing_op():
    """MockProver-grade diagnostics (VerifyFailure capability,
    /root/reference/src/big_integer/chip.rs:1454-1458): a corrupted bigint
    witness must be located by originating gadget op, row, and cells."""
    from halo2_rsa_tpu.bigint import BigIntChip
    from halo2_rsa_tpu.fields import BN254_FR

    b = Builder(BN254_FR)
    chip = BigIntChip(b, 64, 128)
    a = chip.assign_integer(0x1234567890ABCDEF)
    n = chip.assign_integer((1 << 127) + 1)
    r = chip.mul_mod(a, a, n)
    w = checker.witness_limbs(b)
    assert checker.explain(b, w) == []  # honest witness: no failures

    w2 = w.copy()
    w2[r.limb(0).idx][0] ^= 1  # corrupt one limb of the mul_mod result
    fails = checker.explain(b, w2, limit=5)
    assert fails, "corruption must be detected"
    assert any("mul_mod" in f.get("op", "") for f in fails), fails
    gate_fail = next(f for f in fails if f["kind"] == "gate")
    assert r.limb(0).idx in gate_fail["cells"] or gate_fail["row"] >= 0
    text = checker.format_failures(fails)
    assert "mul_mod" in text and "row" in text


def test_explain_locates_lookup_failure():
    from halo2_rsa_tpu.fields import BN254_FR

    b = Builder(BN254_FR)
    rc = RangeChip(b)
    cell = rc.assign(200, 8, 8)
    b.values[cell.idx - 1] = 300
    b.values[cell.idx] = 300
    fails = checker.explain(b, limit=10)
    assert any(f["kind"] == "lookup" for f in fails)
    lk = next(f for f in fails if f["kind"] == "lookup")
    assert lk["value"] == 300 and lk["bits"] == 8
