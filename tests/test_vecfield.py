"""Random-vector parity tests of the vectorized field kernels vs Python ints.

This is the gate for build-plan phase 1 (SURVEY.md §7.1).
"""

import random

import numpy as np
import pytest

from halo2_rsa_tpu.fields import ALL_FIELDS, BN254_FR, vecfield

N = 64


@pytest.fixture(params=ALL_FIELDS, ids=lambda f: f.name)
def field(request):
    return request.param


def _rand_elems(field, n, rng):
    return [rng.randrange(field.p) for _ in range(n)]


def test_roundtrip(field):
    rng = random.Random(0)
    fc = vecfield.consts(field)
    xs = _rand_elems(field, N, rng) + [0, 1, field.p - 1]
    arr = vecfield.from_ints(fc, xs)
    back = vecfield.to_ints(fc, arr)
    assert back == xs


def test_add_sub_neg(field):
    rng = random.Random(1)
    fc = vecfield.consts(field)
    xs = _rand_elems(field, N, rng) + [0, field.p - 1]
    ys = _rand_elems(field, N, rng) + [field.p - 1, field.p - 1]
    a = vecfield.from_ints(fc, xs)
    b = vecfield.from_ints(fc, ys)
    got_add = vecfield.to_ints(fc, vecfield.add(fc, a, b))
    got_sub = vecfield.to_ints(fc, vecfield.sub(fc, a, b))
    got_neg = vecfield.to_ints(fc, vecfield.neg(fc, a))
    for x, y, ga, gs, gn in zip(xs, ys, got_add, got_sub, got_neg):
        assert ga == (x + y) % field.p
        assert gs == (x - y) % field.p
        assert gn == (-x) % field.p


def test_mont_mul(field):
    rng = random.Random(2)
    fc = vecfield.consts(field)
    xs = _rand_elems(field, N, rng) + [0, 1, field.p - 1, field.p - 1]
    ys = _rand_elems(field, N, rng) + [field.p - 1, 1, field.p - 1, 0]
    a = vecfield.from_ints(fc, xs)
    b = vecfield.from_ints(fc, ys)
    got = vecfield.to_ints(fc, vecfield.mont_mul(fc, a, b))
    for x, y, g in zip(xs, ys, got):
        assert g == (x * y) % field.p


def test_inv_and_pow(field):
    rng = random.Random(3)
    fc = vecfield.consts(field)
    xs = [x for x in _rand_elems(field, 8, rng) if x != 0] + [1, field.p - 1]
    a = vecfield.from_ints(fc, xs)
    got_inv = vecfield.to_ints(fc, vecfield.inv(fc, a))
    for x, g in zip(xs, got_inv):
        assert (x * g) % field.p == 1
    got_cube = vecfield.to_ints(fc, vecfield.pow_const(fc, a, 3))
    for x, g in zip(xs, got_cube):
        assert g == pow(x, 3, field.p)


def test_inv_zero_maps_to_zero(field):
    fc = vecfield.consts(field)
    a = vecfield.from_ints(fc, [0])
    assert vecfield.to_ints(fc, vecfield.inv(fc, a)) == [0]


def test_is_zero_eq():
    fc = vecfield.consts(BN254_FR)
    a = vecfield.from_ints(fc, [0, 5, BN254_FR.p])  # p reduces to 0
    z = np.asarray(vecfield.is_zero(a))
    assert list(z) == [True, False, True]
    b = vecfield.from_ints(fc, [0, 5, 1])
    e = np.asarray(vecfield.eq(a, b))
    assert list(e) == [True, True, False]


def test_batch_shapes():
    """Ops accept arbitrary leading batch dims and broadcast."""
    fc = vecfield.consts(BN254_FR)
    rng = random.Random(4)
    xs = _rand_elems(BN254_FR, 12, rng)
    a = vecfield.from_ints(fc, xs).reshape(3, 4, 16)
    out = vecfield.mont_mul(fc, a, a)
    assert out.shape == (3, 4, 16)
    flat = vecfield.to_ints(fc, out.reshape(12, 16))
    for x, g in zip(xs, flat):
        assert g == (x * x) % BN254_FR.p


def test_pallas_mont_mul_parity():
    """Pallas CIOS kernel (interpret mode on CPU) == XLA mont_mul path."""
    import random

    from halo2_rsa_tpu.fields import pallas_mont

    fc = vecfield.consts(BN254_FR)
    rng = random.Random(11)
    n = 200  # not a multiple of 128: exercises padding
    xs = [rng.randrange(BN254_FR.p) for _ in range(n)]
    ys = [rng.randrange(BN254_FR.p) for _ in range(n)]
    a = vecfield.from_ints(fc, xs, mont=True)
    b = vecfield.from_ints(fc, ys, mont=True)
    want = vecfield.mont_mul(fc, a, b)
    got = pallas_mont.mont_mul_pallas(fc, a, b, interpret=True)
    import numpy as np

    assert (np.asarray(got) == np.asarray(want)).all()


import pytest


@pytest.mark.slow
def test_pallas_point_add_double_parity():
    """Fused Pallas G1 point-add/double kernels (interpret mode on CPU)
    == the composed XLA formulas. Slow: interpret mode pays per-op
    interpreter cost on the ~8k-op fused formula (~2 min on 2 CPUs); the
    TPU smoke gate (scripts/tpu_smoke.py) covers the compiled path."""
    import random

    import numpy as np

    from halo2_rsa_tpu.prover import curve, g1_vec, pallas_g1

    rng = random.Random(7)
    pts1 = [curve.g1_mul(curve.G1_GEN, rng.randrange(1, curve.R)) for _ in range(66)]
    pts2 = [curve.g1_mul(curve.G1_GEN, rng.randrange(1, curve.R)) for _ in range(66)]
    pts1[3] = None  # infinity lanes exercise formula completeness
    pts2[5] = None
    p1 = g1_vec.points_to_device(pts1)
    p2 = g1_vec.points_to_device(pts2)
    want = g1_vec.point_add(p1, p2)
    got = pallas_g1.point_add_pallas(g1_vec.FQ, p1, p2, interpret=True)
    for w, g in zip(want, got):
        assert (np.asarray(w) == np.asarray(g)).all()
    want_d = g1_vec.point_double(p1)
    got_d = pallas_g1.point_double_pallas(g1_vec.FQ, p1, interpret=True)
    for w, g in zip(want_d, got_d):
        assert (np.asarray(w) == np.asarray(g)).all()
