#!/usr/bin/env python
"""Where does mont_mul time go? — transpose overhead vs kernel compute.

Every ``mont_mul_any`` call transposes (N,16) <-> (16,N) OUTSIDE the Pallas
kernel; XLA materializes those copies in HBM. This script measures, with the
chained-readback method (block_until_ready is a no-op on axon):

  a) the full dispatch path (transposes + kernel) — what the prover pays
  b) the bare kernel on pre-transposed (16, N) resident data — pure compute
  c) an in-kernel-transpose variant (batch-major blocks, VMEM relayout)

If (b) >> (a), the transposes bound the prover's field throughput and the
kernel should take batch-major blocks.

Usage: python scripts/bench_mont_layout.py [log_n=20] [iters=10]
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

from halo2_rsa_tpu.fields import pallas_mont, vecfield
from halo2_rsa_tpu.fields.field import BN254_FR, NUM_LIMBS

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
n = 1 << log_n
fc = vecfield.consts(BN254_FR)

rng = np.random.default_rng(0)
a_np = rng.integers(0, 1 << 16, (n, NUM_LIMBS), dtype=np.uint32)
b_np = rng.integers(0, 1 << 16, (n, NUM_LIMBS), dtype=np.uint32)
a = jnp.asarray(a_np)
b = jnp.asarray(b_np)
at = jnp.transpose(a, (1, 0))
bt = jnp.transpose(b, (1, 0))


def chain_time(step, x, iters):
    x = step(x)
    _ = int(jnp.sum(x[..., 0]))  # force completion
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _ = int(jnp.sum(x[..., 0]))
    return (time.perf_counter() - t0) / iters


# a) full dispatch path (transposes included)
@jax.jit
def step_full(x):
    return pallas_mont.mont_mul_any(fc, x, b)

t_full = chain_time(step_full, a, iters)
print(f"a) full path      (N=2^{log_n}): {t_full*1e3:8.2f} ms  "
      f"{n/t_full/1e6:8.1f} M el/s", flush=True)

# b) bare kernel on resident (16, N) data
call = pallas_mont._build_call(
    tuple(int(x) for x in fc.p_limbs), int(fc.n0inv), n, False
)

@jax.jit
def step_bare(x):
    return call(x, bt)

t_bare = chain_time(lambda x: step_bare(x), at, iters)
print(f"b) bare kernel    (N=2^{log_n}): {t_bare*1e3:8.2f} ms  "
      f"{n/t_bare/1e6:8.1f} M el/s", flush=True)

# c) XLA rolled path for reference
@jax.jit
def step_xla(x):
    return vecfield._mont_mul(fc, x, b)

t_xla = chain_time(step_xla, a, iters)
print(f"c) XLA limb graph (N=2^{log_n}): {t_xla*1e3:8.2f} ms  "
      f"{n/t_xla/1e6:8.1f} M el/s", flush=True)

# d) in-kernel transpose variant: batch-major (N,16) blocks, relayout in VMEM
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_bm(p_limbs, n0inv, a_ref, b_ref, o_ref):
    at_ = jnp.transpose(a_ref[...], (1, 0))
    bt_ = jnp.transpose(b_ref[...], (1, 0))
    a_rows = [at_[i, :] for i in range(NUM_LIMBS)]
    b_rows = [bt_[i, :] for i in range(NUM_LIMBS)]
    out = pallas_mont._cios_rows(a_rows, b_rows, p_limbs, n0inv)
    o_ref[...] = jnp.transpose(jnp.stack(out), (1, 0))


@functools.lru_cache(maxsize=None)
def build_bm(block):
    spec = pl.BlockSpec((block, NUM_LIMBS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel_bm, tuple(int(x) for x in fc.p_limbs), np.uint32(int(fc.n0inv))
    )
    return jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, NUM_LIMBS), jnp.uint32),
        grid=(n // block,),
        in_specs=[spec, spec],
        out_specs=spec,
    ))

for block in (2048, 4096, 8192):
    try:
        call_bm = build_bm(block)
        t_bm = chain_time(lambda x: call_bm(x, b), a, iters)
        print(f"d) in-kernel T bl={block:5d}:     {t_bm*1e3:8.2f} ms  "
              f"{n/t_bm/1e6:8.1f} M el/s", flush=True)
        got = np.asarray(call_bm(a, b)[:64])
        want = np.asarray(pallas_mont.mont_mul_any(fc, a[:64], b[:64]))
        assert (got == want).all(), "in-kernel-transpose parity FAILED"
    except Exception as e:
        print(f"d) in-kernel T bl={block}: FAILED {repr(e)[:200]}", flush=True)
