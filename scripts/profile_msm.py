#!/usr/bin/env python
"""Per-phase MSM timing: sort/gather, segmented scan, scatter, bucket
reduce, window combine."""

import random
import sys
import time

import jax
import jax.numpy as jnp

from halo2_rsa_tpu.fields import vecfield
from halo2_rsa_tpu.fields.field import BN254_FR
from halo2_rsa_tpu.prover import curve, g1_vec, msm

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 15
rng = random.Random(0)
scalars = [rng.randrange(curve.R) for _ in range(N)]
base = curve.G1_GEN
pts = []
p = base
for _ in range(min(N, 512)):
    pts.append(p)
    p = curve.g1_add(p, base)
points = [pts[i % len(pts)] for i in range(N)]

fr = vecfield.consts(BN254_FR)
sc = vecfield.from_ints(fr, scalars, mont=False)
pd = g1_vec.points_to_device(points)


import numpy as np


def _sync(out):
    # axon block_until_ready is unreliable; a host transfer must wait
    leaves = jax.tree_util.tree_leaves(out)
    for l in leaves:
        np.asarray(jax.device_get(l)).ravel()[:1]


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms", file=sys.stderr)
    return out


digits = timeit("digits", jax.jit(msm.digits_from_scalar_limbs), sc)
buckets = timeit("bucket_sums (sort+segscan+scatter)", jax.jit(msm._bucket_sums), digits, pd)
sums = timeit("bucket_reduce", jax.jit(msm._bucket_reduce), buckets)
res = timeit("window_combine", jax.jit(msm._window_combine), sums)
full = timeit("full msm", msm.msm, sc, pd)


# inner: just the segmented-scan levels (no sort)
@jax.jit
def segscan_only(ds, p_sorted):
    n = ds.shape[1]
    levels = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)

    def level(l, acc):
        d = jnp.int32(1) << l
        src = jnp.maximum(iota - d, 0)
        shifted = tuple(jnp.take(c, src, axis=1) for c in acc)
        same_seg = (iota >= d)[None, :] & (jnp.take(ds, src, axis=1) == ds)
        combined = g1_vec.point_add(acc, shifted)
        return g1_vec.point_select(same_seg, combined, acc)

    return jax.lax.fori_loop(0, levels, level, p_sorted)


@jax.jit
def sort_only(digits, points):
    order = jnp.argsort(digits, axis=1)
    ds = jnp.take_along_axis(digits, order, axis=1)
    return ds, tuple(c[order] for c in points)


ds, p_sorted = timeit("sort+gather", sort_only, digits, pd)
timeit("segscan levels", segscan_only, ds, p_sorted)


@jax.jit
def one_level(acc):
    return g1_vec.point_add(acc, acc)


timeit("single point_add (32,N)", one_level, p_sorted)
