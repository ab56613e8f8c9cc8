#!/usr/bin/env python
"""MSM pipeline stage attribution on TPU.

The fused G1 add kernel runs at ~39 M adds/s, which prices a 2^15-segment
bucket accumulation (~1.05M adds over 32 windows) at ~27 ms — but msm_many
measures ~4x that per poly. This times each stage of _msm_chunk_sums
separately (chained readback) to find the gap.

Usage: python scripts/bench_msm_stages.py [log_n=15] [pc=2] [iters=5]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from halo2_rsa_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from halo2_rsa_tpu.fields import vecfield
from halo2_rsa_tpu.prover import curve, g1_vec, msm
from halo2_rsa_tpu.utils.xjit import fjit

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
pc = int(sys.argv[2]) if len(sys.argv) > 2 else 2
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
n = 1 << log_n
wb = msm._window_bits_for(n)
nb = 1 << wb
w_cnt = 256 // wb

base = g1_vec.points_to_device([curve.g1_mul(curve.G1_GEN, i + 1) for i in range(64)])
points = tuple(jnp.tile(c, (n // 64, 1)) for c in base)
rng = np.random.default_rng(0)
sc = jnp.asarray(rng.integers(0, 1 << 16, (pc, n, 16), dtype=np.uint32))


def timeit(name, fn, *args):
    out = fn(*args)
    _ = int(jnp.sum(jax.tree.leaves(out)[0][..., 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = int(jnp.sum(jax.tree.leaves(out)[0][..., 0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s}: {dt*1e3:9.2f} ms", flush=True)
    return out


# full pipeline
timeit("msm_many (pc polys)", lambda: msm.msm_many(sc, points))
timeit("_msm_chunk_sums_jit", lambda: msm._msm_chunk_sums_jit(sc, points, wb))

# stage 1: digit extraction
@fjit
def stage_digits(sc):
    d = msm.digits_from_scalar_limbs(sc, wb)
    return d.reshape(pc * d.shape[1], d.shape[2])

digits = timeit("digits", stage_digits, sc)

# stage 2: sort + point gather
@fjit
def stage_sort(digits):
    order = jnp.argsort(digits, axis=1)
    ds = jnp.take_along_axis(digits, order, axis=1)
    ps = tuple(c[order] for c in points)
    return ds, ps

ds, ps = timeit("sort + gather", stage_sort, digits)

# stage 3: the chunked sequential scan + HS chunk-total scan + splice
c_len = msm._pick_chunk(n)
npad = -(-n // c_len) * c_len
w_all = digits.shape[0]


@fjit
def stage_scan(ds, ps):
    if npad > n:
        pad = npad - n
        ds = jnp.concatenate([ds, jnp.full((w_all, pad), nb, ds.dtype)], axis=1)
        ident = g1_vec.identity((w_all, pad))
        ps = tuple(jnp.concatenate([c, ic], axis=1) for c, ic in zip(ps, ident))
    n_chunks = npad // c_len
    p3 = tuple(c.reshape(w_all, n_chunks, c_len, 16) for c in ps)
    acc0 = g1_vec.identity((w_all, n_chunks))
    within0 = g1_vec.identity((w_all, n_chunks, c_len))

    def seq_body(j, carry):
        acc, within = carry
        x = tuple(jax.lax.dynamic_slice_in_dim(c, j, 1, axis=2)[:, :, 0] for c in p3)
        acc = g1_vec.point_add(acc, x)
        within = tuple(
            jax.lax.dynamic_update_slice_in_dim(o, a[:, :, None], j, axis=2)
            for o, a in zip(within, acc)
        )
        return acc, within

    totals, within = jax.lax.fori_loop(0, c_len, seq_body, (acc0, within0))
    return totals, within

totals, within = timeit(f"seq scan (C={c_len})", stage_scan, ds, ps)


@fjit
def stage_hs(totals):
    return msm._hs_point_scan(totals, totals[0].shape[1])

timeit("HS chunk-total scan", stage_hs, totals)

# full bucket sums for comparison
@fjit
def stage_buckets(digits):
    return msm._bucket_sums(digits, points, nb)

buckets = timeit("_bucket_sums (all)", stage_buckets, digits)


@fjit
def stage_reduce(buckets):
    return msm._bucket_reduce(buckets)

sums = timeit("_bucket_reduce", stage_reduce, buckets)


@fjit
def stage_combine(sums):
    t = tuple(c.reshape(pc, w_cnt, 16) for c in sums)
    return msm._window_combine(t, wb)

timeit("window combine (Horner)", stage_combine, sums)
