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

BLOCK_N = 8192  # lanes per grid step: 16 rows x 8192 lanes x ~40 live rows
# ~1.3 MB VMEM; measured fastest of {2048, 4096, 8192} on v5e (kern sweep)


# ---------------------------------------------------------------------------
# row algebra (shared by all fused kernels): field elements as Python lists
# of NUM_LIMBS (BN,)-shaped uint32 rows, everything held in VMEM/registers
# ---------------------------------------------------------------------------


def _cond_sub_rows(limbs17, p_limbs):
    """17 canonical rows (< 2p) -> 16 canonical rows mod p."""
    p17 = [np.uint32(x) for x in p_limbs] + [np.uint32(0)]
    borrow = jnp.zeros_like(limbs17[0])
    diff = []
    for j in range(NUM_LIMBS + 1):
        v = limbs17[j] + _BASE - p17[j] - borrow
        diff.append(v & _MASK)
        borrow = jnp.uint32(1) - (v >> LIMB_BITS)
    keep = borrow == 1  # value < p ? keep : diff
    return [jnp.where(keep, limbs17[j], diff[j]) for j in range(NUM_LIMBS)]


def _carry_rows(t, out_limbs):
    """Deferred-carry rows -> canonical rows (< 2^16 each)."""
    limbs = []
    c = jnp.zeros_like(t[0])
    for j in range(out_limbs):
        v = (t[j] if j < len(t) else jnp.zeros_like(t[0])) + c
        limbs.append(v & _MASK)
        c = v >> LIMB_BITS
    return limbs


def _cios_rows(a, b, p_limbs, n0inv):
    """Montgomery product of two 16-row elements (canonical in/out)."""
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
    return _cond_sub_rows(_carry_rows(t, NUM_LIMBS + 1), p_limbs)


def _add_rows(a, b, p_limbs):
    """(a + b) mod p on 16-row canonical elements."""
    s = [a[j] + b[j] for j in range(NUM_LIMBS)]
    return _cond_sub_rows(_carry_rows(s, NUM_LIMBS + 1), p_limbs)


def _sub_rows(a, b, p_limbs):
    """(a - b) mod p on 16-row canonical elements."""
    p = [np.uint32(x) for x in p_limbs]
    borrow = jnp.zeros_like(a[0])
    diff = []
    for j in range(NUM_LIMBS):
        v = a[j] + _BASE - b[j] - borrow
        diff.append(v & _MASK)
        borrow = jnp.uint32(1) - (v >> LIMB_BITS)
    add_back = borrow == 1  # a < b: add p
    corr = [diff[j] + jnp.where(add_back, p[j], np.uint32(0)) for j in range(NUM_LIMBS)]
    return _carry_rows(corr, NUM_LIMBS)


def _mont_mul_kernel_body(p_limbs, n0inv, a_ref, b_ref, o_ref):
    """Unrolled CIOS over (16, BN) blocks. All rows are (BN,) uint32."""
    a = [a_ref[i, :] for i in range(NUM_LIMBS)]
    b = [b_ref[i, :] for i in range(NUM_LIMBS)]
    out = _cios_rows(a, b, p_limbs, n0inv)
    for j in range(NUM_LIMBS):
        o_ref[j, :] = out[j]


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
    # fjit, not jax.jit: interpret mode inlines the kernel body into an
    # XLA:CPU graph whose `fusion` pass is superlinear (see utils.xjit)
    from ..utils.xjit import fjit

    return fjit(call)


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


def mont_mul_any(fc: FieldConsts, a, b, interpret: bool | None = None):
    """Montgomery product over arbitrarily-batched (..., 16) limb arrays:
    broadcast, flatten the batch dims, run the fused kernel, reshape back.

    The drop-in fused form of ``vecfield._mont_mul`` for large batches
    (one HBM round trip instead of one per CIOS step)."""
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (NUM_LIMBS,)).reshape(-1, NUM_LIMBS)
    b = jnp.broadcast_to(b, batch + (NUM_LIMBS,)).reshape(-1, NUM_LIMBS)
    out = mont_mul_pallas(fc, a, b, interpret=interpret)
    return out.reshape(batch + (NUM_LIMBS,))
