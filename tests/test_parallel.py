"""Sharded-checker tests on the virtual 8-device CPU mesh (SURVEY.md §4(e))."""

import random

import numpy as np

from halo2_rsa_tpu.bigint import BigIntChip
from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.parallel import ShardedChecker, make_mesh


def _mulmod_circuit(a_v, b_v, n_v, bits=256):
    b = Builder(BN254_FR)
    chip = BigIntChip(b, 64, bits)
    a = chip.assign_integer(a_v)
    bb = chip.assign_integer(b_v)
    n = chip.assign_integer(n_v)
    res = chip.mul_mod(a, bb, n)
    # witness (not constant!) the expected value so the trace structure is
    # identical across instances and witnesses can batch
    ans = chip.assign_integer((a_v * b_v) % n_v)
    chip.assert_equal_fresh(res, ans)
    return b


def test_sharded_checker_matches_local():
    rng = random.Random(0)
    bits = 256
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)
    builders = []
    for _ in range(4):
        a_v = rng.getrandbits(bits) % n_v
        b_v = rng.getrandbits(bits) % n_v
        builders.append(_mulmod_circuit(a_v, b_v, n_v, bits))
    # same circuit shape for all instances — batch the witnesses
    compiled = checker.compile_circuit(builders[0])
    w = np.stack([checker.witness_limbs(bld) for bld in builders])
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["rows"] == 8
    sc = ShardedChecker(compiled, mesh)
    viol = sc.check(sc.shard_witness(w))
    assert viol.shape == (4,)
    assert (viol == 0).all()

    # tamper one instance — only that instance must report violations
    w_bad = w.copy()
    w_bad[2, 50, 0] ^= 1
    viol2 = sc.check(sc.shard_witness(w_bad))
    assert viol2[2] > 0
    assert viol2[0] == 0 and viol2[1] == 0 and viol2[3] == 0
