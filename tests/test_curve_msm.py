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


def test_final_exponentiation_chain_exact():
    """The Scott-et-al. hard-part addition chain is the EXACT exponent
    (q^4-q^2+1)/r: (a) symbolically, replaying the chain on integer
    exponents mod the cyclotomic order; (b) on a real Miller value against
    the generic 3046-bit ladder."""
    M = c.Q**4 - c.Q**2 + 1
    hard = M // c.R
    x = c.BN_T

    def exp_u(e):
        return e * x % M

    def sqr(e):
        return 2 * e % M

    def mul(a, b):
        return (a + b) % M

    f = 1
    fx, fx2 = exp_u(f), exp_u(exp_u(f))
    fx3 = exp_u(fx2)
    y0 = mul(mul(f * c.Q % M, f * c.Q**2 % M), f * c.Q**3 % M)
    y1 = -f % M
    y2 = fx2 * c.Q**2 % M
    y3 = -(fx * c.Q) % M
    y4 = -mul(fx, fx2 * c.Q % M) % M
    y5 = -fx2 % M
    y6 = -mul(fx3, fx3 * c.Q % M) % M
    t0 = mul(mul(sqr(y6), y4), y5)
    t1 = mul(mul(y3, y5), t0)
    t0 = mul(t0, y2)
    t1 = sqr(mul(sqr(t1), t0))
    t0 = mul(t1, y1)
    t1 = mul(t1, y0)
    assert mul(sqr(t0), t1) == hard % M

    P = c.g1_mul(c.G1_GEN, 987654321)
    Q_ = c.g2_mul(c.G2_GEN, 123456789)
    mf = c.miller_loop(P, Q_)
    assert c.final_exponentiation(mf) == c.final_exponentiation_generic(mf)


def test_precomputed_line_miller_parity():
    """miller_loop_lines against cached G2 line coefficients is bit-equal
    to the on-the-fly miller_loop, for generator and non-generator args."""
    rng = random.Random(3)
    for _ in range(3):
        P = c.g1_mul(c.G1_GEN, rng.randrange(1, c.R))
        Q_ = c.g2_mul(c.G2_GEN, rng.randrange(1, c.R))
        lines = c.precompute_g2_lines(Q_)
        assert c.miller_loop_lines(P, lines) == c.miller_loop(P, Q_)


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


def test_point_add_mixed_parity():
    """RCB15 alg-8 mixed add (projective + affine) must match the host EC
    group law, including the identity and doubling (P+P) corner cases."""
    from halo2_rsa_tpu.prover import curve, g1_vec

    pts = [curve.g1_mul(curve.G1_GEN, i + 1) for i in range(6)]
    lhs = [None, pts[0], pts[1], pts[0], pts[3], pts[4]]
    p1 = g1_vec.points_to_device(lhs)
    p2 = g1_vec.points_to_device(pts)
    mixed = g1_vec.point_add_mixed(p1, tuple(c for c in p2[:2]))
    got = g1_vec.points_from_device(mixed)
    want = [curve.g1_add(a, b) for a, b in zip(lhs, pts)]
    assert got == want
