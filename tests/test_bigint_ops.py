"""BigIntChip op tests — the analog of the reference's
``impl_bigint_test_circuit!`` families (SURVEY.md §4.1; positive/negative
pairs, random inputs vs the Python-int oracle).

Random property tests run at 512 bits to keep CPU wall-time sane (semantics
are size-independent); dedicated 2048-bit parity tests live in
test_bigint_vectors.py. Fields match the reference sweep (BN256 Fq, Pasta
Fp/Fq — /root/reference/src/big_integer/chip.rs:1461-1465).
"""

import random

import pytest

from halo2_rsa_tpu.bigint import BigIntChip, FRESH, MULED, AssignedInteger, RefreshAux, big_pow_mod
from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import REFERENCE_TEST_FIELDS

LIMB_WIDTH = 64
BITS = 512


@pytest.fixture(params=REFERENCE_TEST_FIELDS, ids=lambda f: f.name)
def field(request):
    return request.param


def make_chip(field, bits=BITS):
    b = Builder(field)
    return b, BigIntChip(b, LIMB_WIDTH, bits)


def rand_mod_inputs(seed, bits=BITS):
    """n exactly `bits` bits; a, b < n (mirrors the reference macro harness,
    chip.rs:1437-1444)."""
    rng = random.Random(seed)
    n = 0
    while n.bit_length() != bits:
        n = rng.getrandbits(bits)
    a = rng.getrandbits(bits) % n
    b = rng.getrandbits(bits) % n
    return a, b, n


def test_add_random(field):
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(10)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    added = chip.add(a, bb)
    ans = chip.assign_constant(a_v + b_v, added.num_limbs)
    chip.assert_equal_fresh(added, ans)
    assert checker.run(b)["ok"]


def test_bad_add_rejected(field):
    """a + b == a must fail (mirror chip.rs:1512)."""
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(11)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    added = chip.add(a, bb)
    chip.assert_equal_fresh(added, a)
    assert not checker.run(b)["ok"]


def test_sub_random(field):
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(12)
    hi, lo = max(a_v, b_v), min(a_v, b_v)
    a = chip.assign_integer(hi)
    bb = chip.assign_integer(lo)
    subed, overflow = chip.sub(a, bb)
    ans = chip.assign_constant(hi - lo, subed.num_limbs)
    chip.assert_equal_fresh(subed, ans)
    chip.main_gate.assert_zero(overflow)
    assert checker.run(b)["ok"]


def test_overflow_sub(field):
    """a < b: result is b - a with overflow bit 1 (mirror chip.rs:1588)."""
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(13)
    lo, hi = min(a_v, b_v), max(a_v, b_v)
    if lo == hi:
        hi += 1
    a = chip.assign_integer(lo)
    bb = chip.assign_integer(hi)
    subed, overflow = chip.sub(a, bb)
    ans = chip.assign_constant(hi - lo, subed.num_limbs)
    chip.assert_equal_fresh(subed, ans)
    chip.main_gate.assert_one(overflow)
    assert checker.run(b)["ok"]


def test_mul_random_and_commutative(field):
    """ab == ba over Muled integers (mirror chip.rs:1664, 1699)."""
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(14)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    ab = chip.mul(a, bb)
    ba = chip.mul(bb, a)
    n1, n2 = a.num_limbs, bb.num_limbs
    chip.assert_equal_muled(ab, ba, n1, n2)
    assert checker.run(b)["ok"]


def test_bad_mul_rejected(field):
    """a*b == a*b + 1 must fail (mirror chip.rs:1742)."""
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(15)
    # keep the product within (2n-1) 64-bit limbs so the wrong claim is
    # representable as a constant
    a_v >>= 64
    b_v >>= 64
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    ab = chip.mul(a, bb)
    wrong = chip.assign_constant_muled(a_v * b_v + 1, a.num_limbs, bb.num_limbs)
    chip.assert_equal_muled(ab, wrong, a.num_limbs, bb.num_limbs)
    assert not checker.run(b)["ok"]


def test_fresh_equality(field):
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(16)
    a1 = chip.assign_integer(a_v)
    a2 = chip.assign_integer(a_v)
    chip.assert_equal_fresh(a1, a2)
    assert checker.run(b)["ok"]

    b2, chip2 = make_chip(field)
    x = chip2.assign_integer(a_v)
    y = chip2.assign_integer(b_v if b_v != a_v else a_v + 1)
    chip2.assert_equal_fresh(x, y)
    assert not checker.run(b2)["ok"]


def test_refresh(field):
    """refresh(a*b) == refresh(b*a) as Fresh (mirror chip.rs:1861)."""
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(17)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    ab = chip.mul(a, bb)
    ba = chip.mul(bb, a)
    aux = RefreshAux(LIMB_WIDTH, a.num_limbs, bb.num_limbs)
    ab_f = chip.refresh(ab, aux)
    ba_f = chip.refresh(ba, aux)
    chip.assert_equal_fresh(ab_f, ba_f)
    # value parity with the oracle
    ans = chip.assign_constant(a_v * b_v, ab_f.num_limbs)
    chip.assert_equal_fresh(ab_f, ans)
    assert checker.run(b)["ok"]


def test_three_factor_associativity(field):
    """(a*b)*n == (b*n)*a with refresh between muls (mirror chip.rs:1901)."""
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(18)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    aux = RefreshAux(LIMB_WIDTH, chip.num_limbs, chip.num_limbs)
    ab = chip.refresh(chip.mul(a, bb), aux)
    bn = chip.refresh(chip.mul(bb, n), aux)
    aux2 = RefreshAux(LIMB_WIDTH, ab.num_limbs, chip.num_limbs)
    ab_n = chip.refresh(chip.mul(ab, n), aux2)
    aux3 = RefreshAux(LIMB_WIDTH, bn.num_limbs, chip.num_limbs)
    bn_a = chip.refresh(chip.mul(bn, a), aux3)
    chip.assert_equal_fresh(ab_n, bn_a)
    assert checker.run(b)["ok"]


def test_add_mod(field):
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(19)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    res = chip.add_mod(a, bb, n)
    ans = chip.assign_constant((a_v + b_v) % n_v, res.num_limbs)
    chip.assert_equal_fresh(res, ans)
    assert checker.run(b)["ok"]


def test_sub_mod_both_orders(field):
    """a-b mod n both with and without underflow (mirror chip.rs:2027, 2072)."""
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(20)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    r1 = chip.sub_mod(a, bb, n)
    chip.assert_equal_fresh(r1, chip.assign_constant((a_v - b_v) % n_v, r1.num_limbs))
    r2 = chip.sub_mod(bb, a, n)
    chip.assert_equal_fresh(r2, chip.assign_constant((b_v - a_v) % n_v, r2.num_limbs))
    assert checker.run(b)["ok"]


def test_mul_mod(field):
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(21)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    res = chip.mul_mod(a, bb, n)
    ans = chip.assign_constant((a_v * b_v) % n_v, res.num_limbs)
    chip.assert_equal_fresh(res, ans)
    assert checker.run(b)["ok"]


def test_bad_mul_mod_rejected(field):
    """a*b mod n == a*b mod n + 1 must fail (mirror chip.rs:2190)."""
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(22)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    res = chip.mul_mod(a, bb, n)
    wrong = chip.assign_constant((a_v * b_v % n_v + 1) % n_v, res.num_limbs)
    chip.assert_equal_fresh(res, wrong)
    assert not checker.run(b)["ok"]


def test_pow_mod_var(field):
    """5-bit variable exponent (mirror chip.rs:2229-2270)."""
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(23)
    e_bit = 5
    e_v = b_v & ((1 << e_bit) - 1)
    a = chip.assign_integer(a_v)
    e = chip.assign_constant(e_v, 1)
    n = chip.assign_integer(n_v)
    powed = chip.pow_mod(a, e, n, e_bit)
    ans = chip.assign_constant_fresh(big_pow_mod(a_v, e_v, n_v))
    chip.assert_equal_fresh(powed, ans)
    assert checker.run(b)["ok"]


def test_bad_pow_mod_var(field):
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(24)
    e_bit = 5
    e_v = b_v & ((1 << e_bit) - 1)
    a = chip.assign_integer(a_v)
    e = chip.assign_constant(e_v, 1)
    n = chip.assign_integer(n_v)
    powed = chip.pow_mod(a, e, n, e_bit)
    chip.assert_equal_fresh(powed, chip.assign_constant_fresh(0))
    assert not checker.run(b)["ok"]


def test_pow_mod_fixed(field):
    """Fixed small exponent (mirror chip.rs:2314)."""
    b, chip = make_chip(field)
    a_v, b_v, n_v = rand_mod_inputs(25)
    e_v = b_v & 0b11111
    a = chip.assign_integer(a_v)
    n = chip.assign_integer(n_v)
    powed = chip.pow_mod_fixed_exp(a, e_v, n)
    ans = chip.assign_constant_fresh(big_pow_mod(a_v, e_v, n_v))
    chip.assert_equal_fresh(powed, ans)
    assert checker.run(b)["ok"]


def test_is_zero(field):
    b, chip = make_chip(field)
    z = chip.assign_constant_fresh(0)
    chip.main_gate.assert_one(chip.is_zero(z))
    nz = chip.assign_integer(12345)
    chip.main_gate.assert_zero(chip.is_zero(nz))
    chip.assert_zero(z)
    assert checker.run(b)["ok"]


def test_comparisons(field):
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(26)
    lo_v, hi_v = min(a_v, b_v), max(a_v, b_v)
    if lo_v == hi_v:
        hi_v += 1
    lo = chip.assign_integer(lo_v)
    hi = chip.assign_integer(hi_v)
    mg = chip.main_gate
    mg.assert_one(chip.is_less_than(lo, hi))
    mg.assert_zero(chip.is_less_than(hi, lo))
    mg.assert_one(chip.is_less_than_or_equal(lo, hi))
    mg.assert_one(chip.is_less_than_or_equal(lo, lo))
    mg.assert_one(chip.is_greater_than(hi, lo))
    mg.assert_zero(chip.is_greater_than(lo, hi))
    mg.assert_one(chip.is_greater_than_or_equal(hi, lo))
    mg.assert_one(chip.is_greater_than_or_equal(hi, hi))
    chip.assert_less_than(lo, hi)
    chip.assert_less_than_or_equal(lo, hi)
    chip.assert_greater_than(hi, lo)
    chip.assert_greater_than_or_equal(hi, lo)
    assert checker.run(b)["ok"]


def test_bad_comparison_rejected(field):
    b, chip = make_chip(field)
    a_v, b_v, _ = rand_mod_inputs(27)
    lo_v, hi_v = min(a_v, b_v), max(a_v, b_v)
    if lo_v == hi_v:
        hi_v += 1
    lo = chip.assign_integer(lo_v)
    hi = chip.assign_integer(hi_v)
    chip.assert_less_than(hi, lo)
    assert not checker.run(b)["ok"]


def test_in_field(field):
    """a < n passes; n < n fails (mirror chip.rs:2728, 2765)."""
    b, chip = make_chip(field)
    a_v, _, n_v = rand_mod_inputs(28)
    a = chip.assign_integer(a_v)
    n = chip.assign_integer(n_v)
    chip.assert_in_field(a, n)
    chip.main_gate.assert_one(chip.is_in_field(a, n))
    assert checker.run(b)["ok"]

    b2, chip2 = make_chip(field)
    n2 = chip2.assign_integer(n_v)
    chip2.assert_in_field(n2, n2)
    assert not checker.run(b2)["ok"]


def test_muled_type_conversion(field):
    """Fresh -> Muled widening + equality (mod.rs:393-405 semantics)."""
    b, chip = make_chip(field)
    a_v, _, _ = rand_mod_inputs(29)
    a = chip.assign_integer(a_v)
    zero = chip.main_gate.assign_constant(0)
    one = chip.assign_constant_fresh(1)
    a_muled = chip.mul(a, one)
    chip.assert_equal_muled(a.to_muled(zero), a_muled, a.num_limbs, one.num_limbs)
    assert checker.run(b)["ok"]
