"""Hardcoded-vector parity tests at 2048 bits.

These pin bit-exactness against the reference's spelled-out limb vectors:
mul_case1/3/4/5/6/7 (/root/reference/src/big_integer/chip.rs:2797-3107) and
mulmod_case1-4 (chip.rs:3109-3232). The integers are transcribed verbatim
(they are pure test data).

Run on BN256 Fq (the reference sweeps 3 fields; field choice does not affect
these integer identities, and the other fields are swept in test_bigint_ops).
"""

import random

import pytest

from halo2_rsa_tpu.bigint import BigIntChip
from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FQ

LIMB_WIDTH = 64
BITS = 2048
B = 1 << 64  # out_base


def make_chip():
    b = Builder(BN254_FQ)
    return b, BigIntChip(b, LIMB_WIDTH, BITS)


def from_limbs(limbs):
    x = 0
    for i, v in enumerate(limbs):
        x += v << (64 * i)
    return x


def test_mul_case1():
    """1 * 1 = 1 (chip.rs:2797-2829)."""
    b, chip = make_chip()
    one = chip.assign_constant_fresh(1)
    n = one.num_limbs
    one_muled = chip.mul(one, one)
    zero = chip.main_gate.assign_constant(0)
    chip.assert_equal_muled(one.to_muled(zero), one_muled, n, n)
    assert checker.run(b)["ok"]


def test_mul_case3():
    """(1+0x+3x^2)(3+1x) = 3+1x+9x^2+3x^3 (chip.rs:2831-2872)."""
    b, chip = make_chip()
    a = chip.assign_constant_fresh(from_limbs([1, 0, 3]))
    n1 = a.num_limbs
    bb = chip.assign_constant_fresh(from_limbs([3, 1, 0]))
    n2 = bb.num_limbs
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(from_limbs([3, 1, 9, 3]), n1, n2)
    chip.assert_equal_muled(ab, ans, n1, n2)
    assert checker.run(b)["ok"]


def test_mul_case4():
    """(3+4x+5x^2+6x^3)(9+10x+11x^2+12x^3) (chip.rs:2874-2912)."""
    b, chip = make_chip()
    a = chip.assign_constant_fresh(from_limbs([3, 4, 5, 6]))
    n1 = a.num_limbs
    bb = chip.assign_constant_fresh(from_limbs([9, 10, 11, 12]))
    n2 = bb.num_limbs
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(
        from_limbs([27, 66, 118, 184, 163, 126, 72]), n1, n2
    )
    chip.assert_equal_muled(ab, ans, n1, n2)
    assert checker.run(b)["ok"]


A_CASE5 = [
    4819187580044832333,
    9183764011217009606,
    11426964127496009747,
    17898263845095661790,
    12102522037140783322,
    4029304176671511763,
    11339410859987005436,
    12120243430436644729,
    2888435820322958146,
    7612614626488966390,
    3872170484348249672,
    9589147526444685354,
    16391157694429928307,
    12256166884204507566,
    4257963982333550934,
    916988490704,
]

ANS_CASE5 = [
    23224568931658367244754058218082222889,
    88516562921839445888640380379840781596,
    194478888615417946406783868151393774738,
    382395265476432217957523230769986571504,
    575971019676008360859069855433378813941,
    670174995752918677131397897218932582682,
    780239872348808029089572423614905198300,
    850410093737715640261630122959874522628,
    800314959349304909735238452892956199392,
    906862855407309870283714027678210238070,
    967727310654811444144097720329196927129,
    825671020037461535758117365587238596380,
    991281789723902700168027417052185830252,
    1259367815833216292413970809061165585320,
    1351495628781923848799708082622582598675,
    1451028634949220760698564802414695011932,
    1290756126635958771067082204577975256756,
    936482288980049848345464202850902738826,
    886330568585033438612679243731110283692,
    823948310509772835433730556487356331346,
    649341353489205691855914543942648985328,
    497838205323760437611385487609464464168,
    430091148520710550273018448938020664564,
    474098876922017329965321439330710234148,
    536697574159375092388958994084813127393,
    483446024935732188792400155524449880972,
    289799562463011227421662267162524920264,
    104372664369829937912234314161010649544,
    18130279752377737976455635841349605284,
    7809007931264072381739139035072,
    840867892083599894415616,
    0,
]


def test_mul_case5_transcription_sanity():
    """The transcribed vectors satisfy a^2 == sum(ans_i * B^i) as ints."""
    a = from_limbs(A_CASE5)
    ans = from_limbs(ANS_CASE5)
    assert a * a == ans


def test_mul_case5():
    """Big square with all 32 output limbs spelled out (chip.rs:2914-3023)."""
    b, chip = make_chip()
    a = chip.assign_constant_fresh(from_limbs(A_CASE5))
    n1 = a.num_limbs
    ab = chip.square(a)
    ans = chip.assign_constant_muled(from_limbs(ANS_CASE5), n1, n1)
    chip.assert_equal_muled(ab, ans, n1, n1)
    assert checker.run(b)["ok"]


def test_mul_case6():
    """(1+x)(1+x+x^2) = 1+2x+2x^2+x^3 (chip.rs:3025-3064)."""
    b, chip = make_chip()
    a = chip.assign_constant_fresh(from_limbs([1, 1]))
    bb = chip.assign_constant_fresh(from_limbs([1, 1, 1]))
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(from_limbs([1, 2, 2, 1]), a.num_limbs, bb.num_limbs)
    chip.assert_equal_muled(ab, ans, a.num_limbs, bb.num_limbs)
    assert checker.run(b)["ok"]


def test_mul_case7():
    """(1+7x)(1+x+x^2) = 1+8x+8x^2+7x^3 (chip.rs:3067-3106)."""
    b, chip = make_chip()
    a = chip.assign_constant_fresh(from_limbs([1, 7]))
    bb = chip.assign_constant_fresh(from_limbs([1, 1, 1]))
    ab = chip.mul(a, bb)
    ans = chip.assign_constant_muled(from_limbs([1, 8, 8, 7]), a.num_limbs, bb.num_limbs)
    chip.assert_equal_muled(ab, ans, a.num_limbs, bb.num_limbs)
    assert checker.run(b)["ok"]


def _rand_n_2048(seed):
    rng = random.Random(seed)
    n = 0
    while n.bit_length() != BITS:
        n = rng.getrandbits(BITS)
    return rng, n


def test_mulmod_case1():
    """0 * b = 0 mod n (chip.rs:3109-3147)."""
    b, chip = make_chip()
    rng, n_v = _rand_n_2048(1)
    b_v = rng.getrandbits(BITS) % n_v
    a = chip.assign_constant_fresh(0)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    ab = chip.mul_mod(a, bb, n)
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(0))
    assert checker.run(b)["ok"]


def test_mulmod_case2():
    """n * 1 mod n = 0 (chip.rs:3150-3187)."""
    b, chip = make_chip()
    _, n_v = _rand_n_2048(2)
    a = chip.assign_integer(n_v)
    bb = chip.assign_constant_fresh(1)
    n = chip.assign_integer(n_v)
    ab = chip.mul_mod(a, bb, n)
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(0))
    assert checker.run(b)["ok"]


def test_mulmod_case3():
    """(n-1)^2 mod n = 1 (chip.rs:3190-3229)."""
    b, chip = make_chip()
    _, n_v = _rand_n_2048(3)
    a = chip.assign_integer(n_v - 1)
    bb = chip.assign_integer(n_v - 1)
    n = chip.assign_integer(n_v)
    ab = chip.mul_mod(a, bb, n)
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(1))
    assert checker.run(b)["ok"]


def test_mulmod_case4():
    """(n-1)(n-2) mod n = 2 (chip.rs:3232-3280)."""
    b, chip = make_chip()
    _, n_v = _rand_n_2048(4)
    a = chip.assign_integer(n_v - 1)
    bb = chip.assign_integer(n_v - 2)
    n = chip.assign_integer(n_v)
    ab = chip.mul_mod(a, bb, n)
    chip.assert_equal_fresh(ab, chip.assign_constant_fresh(2))
    assert checker.run(b)["ok"]
