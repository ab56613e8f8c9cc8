#!/usr/bin/env python
"""Fused G1 point-add kernel throughput vs block size.

The MSM's bucket accumulation is ~70% of the whole prove; its core is
pallas_g1._point_add_kernel (12 CIOS muls + adds, ~40 live field rows).
Block size trades VPU utilization against VMEM pressure/spills. Chained
readback timing (axon block_until_ready is a no-op).

Usage: python scripts/bench_g1_block.py [log_n=17] [iters=10]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from halo2_rsa_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import halo2_rsa_tpu.prover.pallas_g1 as pg
from halo2_rsa_tpu.fields import vecfield
from halo2_rsa_tpu.prover import curve, g1_vec

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
n = 1 << log_n

base = g1_vec.points_to_device([curve.g1_mul(curve.G1_GEN, i + 1) for i in range(64)])
p1 = tuple(jnp.tile(c, (n // 64, 1)) for c in base)
p2 = tuple(jnp.tile(c[::-1], (n // 64, 1)) for c in base)


def chain_time(step, x, iters):
    x = step(x)
    _ = int(jnp.sum(x[0][..., 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _ = int(jnp.sum(x[0][..., 0]))
    return (time.perf_counter() - t0) / iters


for blk in (1024, 2048, 4096, 8192):
    pg._G1_BLOCK = blk
    pg._build_call.cache_clear()

    @jax.jit
    def step(p):
        return pg.point_add_pallas(g1_vec.FQ, p, p2)

    try:
        t = chain_time(step, p1, iters)
        print(f"G1 add block={blk:5d}: {t*1e3:8.2f} ms  "
              f"{n/t/1e6:7.2f} M adds/s  ({n*12/t/1e6:7.1f} M muls/s)",
              flush=True)
    except Exception as e:
        print(f"G1 add block={blk}: FAILED {repr(e)[:160]}", flush=True)

# reference: the XLA composed path
pg._G1_BLOCK = 4096
import halo2_rsa_tpu.fields.vecfield as vf
vf._pallas_enabled.cache_clear()
_os.environ["HALO2_RSA_TPU_PALLAS"] = "0"
vf._pallas_enabled.cache_clear()

@jax.jit
def step_xla(p):
    return g1_vec.point_add(p, p2)

try:
    t = chain_time(step_xla, p1, iters)
    print(f"XLA composed path : {t*1e3:8.2f} ms  {n/t/1e6:7.2f} M adds/s",
          flush=True)
finally:
    _os.environ.pop("HALO2_RSA_TPU_PALLAS", None)
    vf._pallas_enabled.cache_clear()
