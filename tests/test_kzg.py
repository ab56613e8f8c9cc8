"""KZG setup/commit/open/verify tests (host-verified pairings)."""

import random

from halo2_rsa_tpu.prover import curve, kzg
from halo2_rsa_tpu.prover.transcript import Transcript, TranscriptReader

R = curve.R


def test_fixed_base_batch():
    from halo2_rsa_tpu.prover import g1_vec

    rng = random.Random(0)
    scalars = [0, 1, 2, rng.randrange(R), R - 1]
    got = g1_vec.points_from_device(kzg.fixed_base_mul_batch(scalars))
    for s, g in zip(scalars, got):
        assert g == curve.g1_mul(curve.G1_GEN, s)


def test_srs_powers():
    srs = kzg.setup(8, tau=12345)
    aff = srs.g1_affine()
    want = 1
    for i in range(8):
        assert aff[i] == curve.g1_mul(curve.G1_GEN, want)
        want = want * 12345 % R
    assert srs.g2_tau == curve.g2_mul(curve.G2_GEN, 12345)


def test_commit_open_verify():
    rng = random.Random(1)
    n = 16
    srs = kzg.setup(n, tau=987654321)
    coeffs = [rng.randrange(R) for _ in range(n)]
    c = kzg.commit(srs, coeffs)
    z = rng.randrange(R)
    v, pi = kzg.open_at(srs, coeffs, z)
    # value parity with host Horner
    want_v = 0
    for a in reversed(coeffs):
        want_v = (want_v * z + a) % R
    assert v == want_v
    assert kzg.verify_open(srs, c, z, v, pi)
    # wrong value must fail
    assert not kzg.verify_open(srs, c, z, (v + 1) % R, pi)
    # wrong point must fail
    assert not kzg.verify_open(srs, c, (z + 1) % R, v, pi)


def test_transcript_prover_verifier_agree():
    t = Transcript()
    p = curve.g1_mul(curve.G1_GEN, 42)
    t.write_point(p)
    t.write_scalar(777)
    c1 = t.challenge()
    t.write_scalar(888)
    c2 = t.challenge()
    assert c1 != c2

    r = TranscriptReader(t.proof_bytes())
    assert r.read_point() == p
    assert r.read_scalar() == 777
    assert r.challenge() == c1
    assert r.read_scalar() == 888
    assert r.challenge() == c2
    assert r.finished()


def test_transcript_tamper_changes_challenge():
    t1 = Transcript()
    t1.write_scalar(1)
    t2 = Transcript()
    t2.write_scalar(2)
    assert t1.challenge() != t2.challenge()
