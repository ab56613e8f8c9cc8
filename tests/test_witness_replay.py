"""Batched witness replay: replayed witnesses must match fresh synthesis
bit-for-bit, and satisfy the checker."""

import random

import numpy as np

from halo2_rsa_tpu.bigint import BigIntChip
from halo2_rsa_tpu.circuit import Builder, MainGate, RangeChip, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.witness import WitnessProgram


def _mulmod_builder(a_v, b_v, n_v, bits):
    b = Builder(BN254_FR)
    chip = BigIntChip(b, 64, bits)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    res = chip.mul_mod(a, bb, n)
    ans = chip.assign_integer((a_v * b_v) % n_v)
    chip.assert_equal_fresh(res, ans)
    return b


def _instance_inputs(builder_template, builder_inst):
    """Input values of a synthesized instance keyed by the template's cells."""
    return {i: builder_inst.values[i] for i in builder_template.input_cells()}


def test_replay_matches_synthesis_mulmod():
    rng = random.Random(0)
    bits = 256
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)

    def sample():
        return rng.getrandbits(bits) % n_v, rng.getrandbits(bits) % n_v

    a0, b0 = sample()
    template = _mulmod_builder(a0, b0, n_v, bits)
    prog = WitnessProgram(template)

    insts = []
    builders = [template]
    for _ in range(3):
        a_v, b_v = sample()
        builders.append(_mulmod_builder(a_v, b_v, n_v, bits))
    instances = [_instance_inputs(template, bb) for bb in builders]
    w = prog.generate(instances)
    assert w.shape[0] == 4

    for bi, bb in enumerate(builders):
        want = checker.witness_limbs(bb)
        got = w[bi]
        assert (got == want).all(), f"instance {bi}: replay diverges"

    # and the replayed witnesses satisfy the compiled circuit
    compiled = checker.compile_circuit(template)
    for bi in range(4):
        assert checker.check(compiled, w[bi])["ok"]


def test_replay_logic_ops():
    """select / is_zero / to_bits / or in one circuit."""

    def build(x, y):
        b = Builder(BN254_FR)
        mg = MainGate(b)
        a = mg.assign_value(x)
        c = mg.assign_value(y)
        eqb = mg.is_equal(a, c)
        sel = mg.select(a, c, eqb)
        bits = mg.to_bits(sel, 16)
        o = mg.or_(bits[0], bits[1])
        mg.assert_bit(o)
        rc = RangeChip(b)
        rc.assign(x & 0xFF, 4, 8, source=a)
        return b

    t = build(0xAB, 0xAB)
    prog = WitnessProgram(t)
    cases = [(0xAB, 0xAB), (3, 5), (0, 0), (65535, 1)]
    builders = [build(x, y) for x, y in cases]
    instances = [_instance_inputs(t, bb) for bb in builders]
    w = prog.generate(instances)
    for bi, bb in enumerate(builders):
        assert (w[bi] == checker.witness_limbs(bb)).all(), f"case {cases[bi]}"


def test_replay_pow_mod():
    """pow_mod_fixed_exp (the RSA hot path) replays correctly."""
    rng = random.Random(7)
    bits = 128
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)

    def build(x_v):
        b = Builder(BN254_FR)
        chip = BigIntChip(b, 64, bits)
        x = chip.assign_integer(x_v)
        n = chip.assign_integer(n_v)
        chip.assert_in_field(x, n)
        # e = 257 = 2^8 + 1: the same LSB-first square-and-multiply code
        # path as 65537 (shared square_mod + final mul_mod) at 9/17 the
        # steps — the full-e case runs in the slow tier's SNARK round trips
        powed = chip.pow_mod_fixed_exp(x, 257, n)
        ans = chip.assign_integer(pow(x_v, 257, n_v))
        chip.assert_equal_fresh(powed, ans)
        return b

    t = build(rng.getrandbits(bits) % n_v)
    prog = WitnessProgram(t)
    builders = [t] + [build(rng.getrandbits(bits) % n_v) for _ in range(2)]
    instances = [_instance_inputs(t, bb) for bb in builders]
    w = prog.generate(instances)
    for bi, bb in enumerate(builders):
        assert (w[bi] == checker.witness_limbs(bb)).all()
