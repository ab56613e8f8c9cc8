"""Sharded-checker tests on the virtual 8-device CPU mesh (SURVEY.md §4(e))."""

import random

import numpy as np

from halo2_rsa_tpu.bigint import BigIntChip
from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.parallel import (
    ShardedChecker,
    WireShardedChecker,
    intt_sharded,
    make_mesh,
    ntt_sharded,
)


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


def test_wire_sharded_checker_matches_replicated():
    """De-replicated (wire-routed) checker: bit-identical verdicts to the
    replicated checker, with no witness array replicated along rows."""
    rng = random.Random(1)
    bits = 256
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)
    builders = []
    for _ in range(4):
        a_v = rng.getrandbits(bits) % n_v
        b_v = rng.getrandbits(bits) % n_v
        builders.append(_mulmod_circuit(a_v, b_v, n_v, bits))
    compiled = checker.compile_circuit(builders[0])
    w = np.stack([checker.witness_limbs(bld) for bld in builders])
    mesh = make_mesh()
    wc = WireShardedChecker(compiled, mesh)
    viol = wc.check(wc.route(w))
    assert viol.shape == (4,)
    assert (viol == 0).all()

    # tamper: gate violations localize to the right instance
    w_bad = w.copy()
    w_bad[1, 50, 0] ^= 1
    viol2 = wc.check(wc.route(w_bad))
    sc = ShardedChecker(compiled, mesh)
    viol2_ref = sc.check(sc.shard_witness(w_bad))
    assert (viol2 == viol2_ref).all(), "wire-routed must match replicated"
    assert viol2[1] > 0 and viol2[0] == 0

    # out-of-range lookup value caught too
    w_bad2 = w.copy()
    bits0, idx = compiled.lookup_groups[0]
    cell = int(idx[0])
    w_bad2[3, cell, bits0 // 16] += 1 << (bits0 % 16)
    viol3 = wc.check(wc.route(w_bad2))
    assert viol3[3] > 0 and viol3[0] == 0


def test_sharded_ntt_matches_single_device():
    """Four-step distributed NTT == single-device NTT, fwd/inv, 1- and
    2-axis meshes, single and batched inputs."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from halo2_rsa_tpu.fields import vecfield
    from halo2_rsa_tpu.fields.field import BN254_FR
    from halo2_rsa_tpu.prover import ntt

    fr = vecfield.consts(BN254_FR)
    rng = random.Random(7)
    log_n = 8
    n = 1 << log_n
    vals = [rng.randrange(BN254_FR.p) for _ in range(n)]
    x = jnp.asarray(vecfield.from_ints_np(fr, vals, mont=True))

    devs = np.array(jax.devices())
    mesh = Mesh(devs.reshape(len(devs)), ("rows",))
    want = np.asarray(ntt.ntt(x, log_n))
    got = np.asarray(ntt_sharded(x, log_n, mesh))
    assert (got == want).all(), "forward sharded NTT mismatch"

    want_i = np.asarray(ntt.intt(x, log_n))
    got_i = np.asarray(intt_sharded(x, log_n, mesh))
    assert (got_i == want_i).all(), "inverse sharded NTT mismatch"

    # batched (P, N, 16)
    vals2 = [rng.randrange(BN254_FR.p) for _ in range(n)]
    xb = jnp.stack([x, jnp.asarray(vecfield.from_ints_np(fr, vals2, mont=True))])
    wantb = np.asarray(ntt.ntt_batch(xb, log_n))
    gotb = np.asarray(ntt_sharded(xb, log_n, mesh))
    assert (gotb == wantb).all(), "batched sharded NTT mismatch"

    # roundtrip on a 2D mesh's rows axis
    mesh2 = Mesh(devs.reshape(2, 4), ("data", "rows"))
    rt = np.asarray(intt_sharded(ntt_sharded(x, log_n, mesh2), log_n, mesh2))
    assert (rt == np.asarray(x)).all(), "sharded NTT roundtrip mismatch"
