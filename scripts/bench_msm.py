#!/usr/bin/env python
"""Microbenchmark: single-chip Pippenger MSM throughput (points/s)."""

import random
import sys
import time

import jax

from halo2_rsa_tpu.fields import vecfield
from halo2_rsa_tpu.fields.field import BN254_FR
from halo2_rsa_tpu.prover import curve, g1_vec, msm

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 15

rng = random.Random(0)
scalars = [rng.randrange(curve.R) for _ in range(N)]
# synthetic distinct points: cheap to generate, correctness checked in tests
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

t0 = time.perf_counter()
res = msm.msm(sc, pd)
jax.block_until_ready(res)
t1 = time.perf_counter()
print(f"compile+first run: {t1-t0:.2f}s", file=sys.stderr)

iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    res = msm.msm(sc, pd)
jax.block_until_ready(res)
dt = (time.perf_counter() - t0) / iters
print(f"N={N}: {dt*1000:.1f} ms/MSM -> {N/dt:,.0f} points/s", file=sys.stderr)

# verify against a host-checkable construction: all scalars 1 -> sum of points
ones = vecfield.from_ints(fr, [1] * N, mont=False)
res2 = g1_vec.points_from_device(tuple(c[None] for c in msm.msm(ones, pd)))[0]
import functools
want = None
for p in points:
    want = curve.g1_add(want, p)
print("sum-check:", "OK" if res2 == want else f"MISMATCH {res2} vs {want}", file=sys.stderr)

t0 = time.perf_counter()
for _ in range(20):
    res = msm.msm(sc, pd)
    jax.block_until_ready(res)
dt = (time.perf_counter() - t0) / 20
print(f"blocked per-iter: N={N}: {dt*1000:.1f} ms/MSM -> {N/dt:,.0f} points/s", file=sys.stderr)
