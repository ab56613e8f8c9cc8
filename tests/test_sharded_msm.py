"""Sharded MSM over the 8-device CPU mesh: parity with the host reference."""

import random

import numpy as np
import jax
from jax.sharding import Mesh

from halo2_rsa_tpu.fields import BN254_FR, vecfield
from halo2_rsa_tpu.parallel import make_sharded_msm
from halo2_rsa_tpu.prover import curve, g1_vec, msm


def test_sharded_msm_matches_host():
    rng = random.Random(0)
    n = 64
    scalars = [rng.randrange(curve.R) for _ in range(n)]
    points = [curve.g1_mul(curve.G1_GEN, rng.randrange(1, curve.R)) for _ in range(n)]
    want = msm.msm_host(scalars, points)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("rows",))
    fn = make_sharded_msm(mesh)
    fr = vecfield.consts(BN254_FR)
    res = fn(
        vecfield.from_ints(fr, scalars, mont=False), g1_vec.points_to_device(points)
    )
    got = g1_vec.points_from_device(tuple(c[None] for c in res))[0]
    assert got == want


def test_sharded_msm_unaligned_n():
    """N not divisible by the axis size pads with identity points.

    n = 61 pads to the SAME 64-point shape as the aligned test above, so
    this case reuses its compiled graph instead of compiling a second
    size class (~50 s on the 2-CPU tier host)."""
    rng = random.Random(1)
    n = 61
    scalars = [rng.randrange(curve.R) for _ in range(n)]
    points = [curve.g1_mul(curve.G1_GEN, rng.randrange(1, curve.R)) for _ in range(n)]
    want = msm.msm_host(scalars, points)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("rows",))
    fn = make_sharded_msm(mesh)
    fr = vecfield.consts(BN254_FR)
    res = fn(
        vecfield.from_ints(fr, scalars, mont=False), g1_vec.points_to_device(points)
    )
    got = g1_vec.points_from_device(tuple(c[None] for c in res))[0]
    assert got == want
