"""Curve-layer tests: host pairing bilinearity, vectorized G1 ops, MSM."""

import random

import numpy as np
import pytest

from halo2_rsa_tpu.prover import curve as c
from halo2_rsa_tpu.prover import g1_vec, msm


def test_generators_and_subgroup():
    assert c.g1_is_on_curve(c.G1_GEN)
    assert c.g2_is_on_curve(c.G2_GEN)
    assert c.g1_mul(c.G1_GEN, c.R) is None
    assert c.g2_mul(c.G2_GEN, c.R) is None


def test_pairing_bilinear():
    e1 = c.pairing(c.G1_GEN, c.G2_GEN)
    assert e1 != c.FQ12_ONE
    assert c.pairing(c.g1_mul(c.G1_GEN, 2), c.G2_GEN) == c.fq12_sqr(e1)
    assert c.pairing(c.G1_GEN, c.g2_mul(c.G2_GEN, 2)) == c.fq12_sqr(e1)
    a, b = 94823, 31337
    l = c.pairing(c.g1_mul(c.G1_GEN, a), c.g2_mul(c.G2_GEN, b))
    r = c.pairing(c.g1_mul(c.G1_GEN, b), c.g2_mul(c.G2_GEN, a))
    assert l == r
    assert c.pairing_check(
        [
            (c.g1_mul(c.G1_GEN, a), c.g2_mul(c.G2_GEN, b)),
            (c.g1_neg(c.g1_mul(c.G1_GEN, a * b)), c.G2_GEN),
        ]
    )


def test_vectorized_point_ops_match_host():
    rng = random.Random(0)
    pts = [c.g1_mul(c.G1_GEN, rng.randrange(1, c.R)) for _ in range(8)]
    qts = [c.g1_mul(c.G1_GEN, rng.randrange(1, c.R)) for _ in range(8)]
    p_dev = g1_vec.points_to_device(pts)
    q_dev = g1_vec.points_to_device(qts)
    got_add = g1_vec.points_from_device(g1_vec.point_add(p_dev, q_dev))
    got_dbl = g1_vec.points_from_device(g1_vec.point_double(p_dev))
    for p, q, ga, gd in zip(pts, qts, got_add, got_dbl):
        assert ga == c.g1_add(p, q)
        assert gd == c.g1_add(p, p)


def test_vectorized_identity_handling():
    """Complete formulas must handle infinity and P + (-P) without branches."""
    rng = random.Random(1)
    p = c.g1_mul(c.G1_GEN, rng.randrange(1, c.R))
    pts = [p, None, p, None]
    qts = [c.g1_neg(p), p, None, None]
    got = g1_vec.points_from_device(
        g1_vec.point_add(g1_vec.points_to_device(pts), g1_vec.points_to_device(qts))
    )
    assert got == [None, p, p, None]
    # doubling infinity stays infinity
    got2 = g1_vec.points_from_device(g1_vec.point_double(g1_vec.points_to_device([None])))
    assert got2 == [None]


@pytest.mark.parametrize("n", [1, 2, 37, 128])
def test_msm_matches_host(n):
    rng = random.Random(n)
    scalars = [rng.randrange(c.R) for _ in range(n)]
    points = [c.g1_mul(c.G1_GEN, rng.randrange(1, c.R)) for _ in range(n)]
    want = msm.msm_host(scalars, points)
    got = msm.run_msm(scalars, points)
    assert got == want


def test_msm_edge_scalars():
    """Zero scalars, duplicate digits, identity points."""
    rng = random.Random(9)
    scalars = [0, 1, c.R - 1, 0xFF, 0xFF00, rng.randrange(c.R), 2**253, 7]
    points = [c.g1_mul(c.G1_GEN, rng.randrange(1, c.R)) for _ in range(7)] + [None]
    want = msm.msm_host(scalars, points)
    got = msm.run_msm(scalars, points)
    assert got == want


def test_msm_point_axis_segmentation(monkeypatch):
    """The large-N segment path (window sums accumulated across point-axis
    segments, one Horner at the end) is bit-identical to the direct path —
    exercised at a tiny _SEG so CPU covers the TPU large-N structure."""
    import random

    from halo2_rsa_tpu.prover import curve, msm

    rng = random.Random(21)
    n = 256
    pts = [curve.g1_mul(curve.G1_GEN, rng.randrange(1, curve.R)) for _ in range(n)]
    scalars = [rng.randrange(curve.R) for _ in range(n)]
    want = msm.run_msm(scalars, pts)
    monkeypatch.setattr(msm, "_SEG", 64)
    got = msm.run_msm(scalars, pts)
    assert got == want == msm.msm_host(scalars, pts)
