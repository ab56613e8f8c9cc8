#!/usr/bin/env python
"""Raw VPU op-rate probes for the CIOS kernel's op mix.

Measures, in a single Pallas kernel over VMEM-resident (16, N) uint32
blocks, the sustained rate of:
  a) mul:        x = x * y            (the 16x16->32 product primitive)
  b) mad:        x = x * y + z
  c) split-acc:  t += (x*y) & m ; u += (x*y) >> 16   (the CIOS inner step)
  d) add-only:   x = x + y

The CIOS kernel does ~512 (c)-steps + carry/cond-sub per element; these
rates give the speed-of-light for the CURRENT formulation, separating
"kernel underutilizes the VPU" from "the formulation costs this much".

Usage: python scripts/bench_vpu_ops.py [log_n=20] [reps=64] [iters=8]
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

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
N = 1 << log_n
BLOCK = 8192
MASK = np.uint32(0xFFFF)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mk(body):
    spec = pl.BlockSpec((16, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)

    def kern(x_ref, y_ref, o_ref):
        x = x_ref[...]
        y = y_ref[...]
        o_ref[...] = body(x, y)

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.uint32),
        grid=(N // BLOCK,),
        in_specs=[spec, spec],
        out_specs=spec,
    )
    return jax.jit(call)


def body_mul(x, y):
    for _ in range(REPS):
        x = x * y
    return x


def body_mad(x, y):
    for _ in range(REPS):
        x = x * y + y
    return x


def body_split(x, y):
    t = jnp.zeros_like(x)
    u = jnp.zeros_like(x)
    for _ in range(REPS):
        p = x * y
        t = t + (p & MASK)
        u = u + (p >> 16)
        x = x + u  # keep the chain live
    return t + x


def body_add(x, y):
    for _ in range(REPS):
        x = x + y
    return x


def body_mul_ilp(x, y):
    """4 independent mul chains — throughput, not latency."""
    a, b, c, d = x, x + y, x + y + y, x * y
    for _ in range(REPS // 4):
        a = a * y
        b = b * y
        c = c * y
        d = d * y
    return a + b + c + d


def body_add_ilp(x, y):
    a, b, c, d = x, x + y, x + y + y, x * y
    for _ in range(REPS // 4):
        a = a + y
        b = b + y
        c = c + y
        d = d + y
    return a + b + c + d


def body_split_ilp(x, y):
    """Two independent CIOS-step chains (mirrors t[j]/t[j+1] ILP)."""
    t0 = jnp.zeros_like(x)
    u0 = jnp.zeros_like(x)
    t1 = x + y
    u1 = x * y
    for _ in range(REPS // 2):
        p0 = x * y
        t0 = t0 + (p0 & MASK)
        u0 = u0 + (p0 >> 16)
        p1 = (x + u0) * y
        t1 = t1 + (p1 & MASK)
        u1 = u1 + (p1 >> 16)
    return t0 + t1 + u1


def chain_time(fn, x, y):
    z = fn(x, y)
    _ = int(jnp.sum(z[:, :8]))
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(z, y)
    _ = int(jnp.sum(z[:, :8]))
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 16, (16, N), dtype=np.uint32))
y = jnp.asarray(rng.integers(1, 1 << 16, (16, N), dtype=np.uint32))

lanes = 16 * N
for name, fn, ops_per_rep in (
    ("mul", _mk(body_mul), 1),
    ("mad", _mk(body_mad), 2),
    ("split-acc", _mk(body_split), 6),
    ("add", _mk(body_add), 1),
    ("mul-ilp4", _mk(body_mul_ilp), 1),
    ("add-ilp4", _mk(body_add_ilp), 1),
    ("split-ilp2", _mk(body_split_ilp), 6),
):
    t = chain_time(fn, x, y)
    ops = lanes * REPS * ops_per_rep
    print(
        f"{name:10s}: {t*1e3:8.3f} ms  {ops/t/1e12:6.2f} T ops/s "
        f"({lanes*REPS/t/1e12:5.2f} T {name}-steps/s)",
        flush=True,
    )
