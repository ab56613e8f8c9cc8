"""Vectorized prime-field arithmetic for TPU (JAX).

This is the foundation of the whole framework: every constraint-check, NTT
butterfly and MSM point-add reduces to batched arithmetic mod ``p``.

Representation: an element is ``NUM_LIMBS`` (=16) base-``2^LIMB_BITS`` (=16)
limbs stored in a trailing axis of a ``uint32`` array. TPUs have no 64-bit
integer multiplier, so 16x16->32-bit limb products are the widest primitive
multiplication available; sums of 16-bit quantities are accumulated in uint32
lanes with deferred carries (bounded well below 2^32) and carries are
propagated in a single fixed-length pass. Multiplication uses CIOS Montgomery
reduction, fully unrolled (static shapes, no data-dependent control flow, no
scatters — only pads/slices), so XLA sees one fusable elementwise graph over
the batch dimensions.

All public ops are jitted with the field constants static; they are pure,
vmap-safe and shard_map-safe, and batch dims are arbitrary leading axes.

Capability parity note: the reference delegates field arithmetic to the Rust
``halo2curves``/``pasta_curves`` crates via halo2wrong (Cargo.toml:13-14);
this module is the from-scratch TPU-native equivalent.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.xjit import fjit
from .field import LIMB_BITS, LIMB_MASK, NUM_LIMBS, PrimeField
from .limbs import int_to_field_limbs

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


@functools.lru_cache(maxsize=1)
def _rolled() -> bool:
    """Whether limb loops (CIOS steps, carry/borrow chains) are built as
    ``lax.fori_loop``/``lax.scan`` bodies instead of Python-unrolled graphs.

    Rolled graphs are ~10-20x smaller, which is what keeps XLA trace+compile
    time bounded for the prover's many large jitted programs (a fully
    unrolled point-add alone is ~3.5k HLO ops and the round-1 prover could
    not compile in 10 minutes). The unrolled form fuses into one elementwise
    kernel and can be re-enabled per-run with HALO2_RSA_TPU_UNROLL=1 when
    runtime matters more than compile time (e.g. a long TPU bench sweep).
    """
    return os.environ.get("HALO2_RSA_TPU_UNROLL", "0") not in ("1", "true")


@functools.lru_cache(maxsize=1)
def _pallas_enabled() -> bool:
    """Whether large-batch Montgomery muls dispatch to the fused Pallas TPU
    kernel (:mod:`.pallas_mont`) instead of the XLA limb-op graph.

    Defaults to on for the TPU backend (the kernel keeps the whole CIOS in
    VMEM — one HBM round trip instead of one per step); off elsewhere (the
    XLA path is what the CPU test mesh exercises). HALO2_RSA_TPU_PALLAS=0/1
    overrides.

    Read ONCE at the first field op and cached for the process lifetime;
    flipping the env var afterwards is ignored. Tests that need to exercise
    the other path must call ``_pallas_enabled.cache_clear()`` (and clear jit
    caches) after setting the env var."""
    env = os.environ.get("HALO2_RSA_TPU_PALLAS", "")
    if env in ("0", "false"):
        return False
    if env in ("1", "true"):
        return True
    return jax.default_backend() == "tpu"


_PALLAS_MIN_BATCH = 1024


def _chains_rolled() -> bool:
    """Whether carry/borrow chains build as lax.scan (small graphs, many
    sequential micro-kernels) or unroll into one fusable elementwise chain.

    On TPU (pallas mode) the ~50-op unrolled chain is strictly better: XLA
    fuses it into a single pass where the scan form makes 16 sequential
    passes over HBM. The scan form remains the CPU default for bounded
    compile time of whole-prover graphs."""
    return _rolled() and not _pallas_enabled()


def _pallas_dispatch(a, b) -> bool:
    """Use the fused kernel for this mul? Large static batches only; under
    vmap the batch dim is invisible here, so defer to the XLA path (which
    vmap transforms soundly)."""
    if not _pallas_enabled():
        return False
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # private path moved in a JAX upgrade: XLA fallback
        return False

    if isinstance(a, BatchTracer) or isinstance(b, BatchTracer):
        return False
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    size = 1
    for d in batch:
        size *= d
    return size >= _PALLAS_MIN_BATCH


class FieldConsts:
    """Device-side constants for one prime field (limb arrays).

    Hashable by identity; always obtain via :func:`consts` so jit caches hit.
    """

    def __repr__(self) -> str:
        # stable across processes (the default id()-based repr is not):
        # FieldConsts appears as a static jit arg, and utils.xjit's AOT
        # cache keys hash static reprs
        return f"FieldConsts({self.field.name}, p={self.field.p:#x})"

    def __init__(self, field: PrimeField):
        # All constants are *numpy* arrays: they embed into lowered programs
        # directly, with no device->host copies at trace/lower time (which
        # would round-trip a network tunnel on remote TPU setups).
        self.field = field
        self.p_limbs = int_to_field_limbs(field.p)
        # p extended with a zero 17th limb, for 17-limb comparisons.
        self.p17 = np.concatenate([int_to_field_limbs(field.p), np.zeros(1, np.uint32)])
        self.n0inv = np.uint32(field.n0inv)
        self.r_limbs = int_to_field_limbs(field.r)
        self.r2_limbs = int_to_field_limbs(field.r2)
        # bits of p-2, LSB-first (for Fermat inversion).
        e = field.p - 2
        self.p_minus_2_bits = np.array(
            [(e >> i) & 1 for i in range(e.bit_length())], np.uint32
        )

    def __repr__(self):
        return f"FieldConsts({self.field.name})"


@functools.lru_cache(maxsize=None)
def consts(field: PrimeField) -> FieldConsts:
    return FieldConsts(field)


def _pad_last(x, before: int, after: int):
    if before == 0 and after == 0:
        return x
    cfg = [(0, 0, 0)] * (x.ndim - 1) + [(before, after, 0)]
    return jax.lax.pad(x, jnp.uint32(0), cfg)


# ---------------------------------------------------------------------------
# carry / borrow helpers (fixed-length unrolled passes)
# ---------------------------------------------------------------------------


def _carry_prop(t, out_limbs: int):
    """Propagate deferred carries: t (..., k) uint32 limbs (< 2^32 each)
    -> canonical (..., out_limbs) limbs < 2^16. The true value must fit.

    Rolled (lax.scan over the limb axis) by default for bounded compile
    time; HALO2_RSA_TPU_UNROLL=1 unrolls into one fusable elementwise
    chain (see :func:`_rolled`)."""
    k = t.shape[-1]
    if k < out_limbs:
        t = _pad_last(t, 0, out_limbs - k)
    elif k > out_limbs:
        t = t[..., :out_limbs]
    if _chains_rolled():
        tT = jnp.moveaxis(t, -1, 0)

        def step(c, v):
            v = v + c
            return v >> LIMB_BITS, v & _MASK

        _, outs = jax.lax.scan(step, jnp.zeros(t.shape[:-1], _U32), tT)
        return jnp.moveaxis(outs, 0, -1)
    c = jnp.zeros(t.shape[:-1], _U32)
    outs = []
    for i in range(out_limbs):
        v = t[..., i] + c
        outs.append(v & _MASK)
        c = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1)


def _sub_limbs(a, b):
    """(a - b) with borrow chain over canonical limbs.

    Returns (diff_limbs, borrow_out) where borrow_out==1 iff a < b.
    Unrolled borrow chain (fusible elementwise graph)."""
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    n = max(a.shape[-1], b.shape[-1])
    a = jnp.broadcast_to(a, batch + (n,))
    b = jnp.broadcast_to(b, batch + (n,))
    base = np.uint32(1 << LIMB_BITS)
    if _chains_rolled():

        def step(borrow, ab):
            av, bv = ab
            v = av + base - bv - borrow
            return jnp.uint32(1) - (v >> LIMB_BITS), v & _MASK

        borrow, outs = jax.lax.scan(
            step,
            jnp.zeros(batch, _U32),
            (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)),
        )
        return jnp.moveaxis(outs, 0, -1), borrow
    borrow = jnp.zeros(batch, _U32)
    outs = []
    for i in range(n):
        v = a[..., i] + base - b[..., i] - borrow
        outs.append(v & _MASK)
        borrow = jnp.uint32(1) - (v >> LIMB_BITS)
    return jnp.stack(outs, axis=-1), borrow


def _cond_sub_p(t17, fc: FieldConsts):
    """Given canonical t (..., 17) with t < 2p, return t mod p in 16 limbs."""
    diff, borrow = _sub_limbs(t17, fc.p17)
    keep = (borrow == 1)[..., None]
    res = jnp.where(keep, t17, diff)
    return res[..., :NUM_LIMBS]


# ---------------------------------------------------------------------------
# core ops (private, un-jitted graph builders)
# ---------------------------------------------------------------------------


def _add(fc, a, b):
    s = a + b  # limbs < 2^17, deferred
    t17 = _carry_prop(s, NUM_LIMBS + 1)
    return _cond_sub_p(t17, fc)


def _sub(fc, a, b):
    diff, borrow = _sub_limbs(a, b)
    corr = diff + jnp.where((borrow == 1)[..., None], fc.p_limbs, jnp.uint32(0))
    return _carry_prop(corr, NUM_LIMBS)


def _mont_mul(fc, a, b):
    """CIOS Montgomery multiplication over the 16 limb steps.

    Each step is a handful of vector ops over the (batch, 17) running state
    (products vectorized along the limb axis, shifts as pads). Deferred-carry
    bound: each step adds <= 4*(2^16-1) + carry to a limb, 16 steps => limbs
    stay < 2^23, well inside u32. The step loop is a ``fori_loop`` by default
    (bounded compile time); HALO2_RSA_TPU_UNROLL=1 unrolls it into one
    fusable elementwise graph (see :func:`_rolled`)."""
    if _pallas_dispatch(a, b):
        from . import pallas_mont

        return pallas_mont.mont_mul_any(fc, a, b)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    b = jnp.broadcast_to(b, batch + (NUM_LIMBS,))
    a = jnp.broadcast_to(a, batch + (NUM_LIMBS,))
    t = jnp.zeros(batch + (NUM_LIMBS + 1,), _U32)
    p = fc.p_limbs
    n0inv = fc.n0inv

    def step(ai, t):
        prod = ai * b
        t = t + _pad_last(prod & _MASK, 0, 1) + _pad_last(prod >> LIMB_BITS, 1, 0)
        m = ((t[..., :1] & _MASK) * n0inv) & _MASK
        prod2 = m * p
        t = t + _pad_last(prod2 & _MASK, 0, 1) + _pad_last(prod2 >> LIMB_BITS, 1, 0)
        # shift one limb down; t[0] ≡ 0 mod 2^16, its upper bits carry into
        # the next limb.
        carry0 = t[..., :1] >> LIMB_BITS
        return _pad_last(t[..., 1:], 0, 1) + _pad_last(carry0, 0, NUM_LIMBS)

    # Rolled (fori_loop) keeps graphs small for the CPU backend; with the
    # Pallas path active the non-dispatched (small-batch) muls unroll so XLA
    # fuses them — e.g. the MSM Horner tail's few-lane point ops, which the
    # scan form turns into hundreds of sequential micro-kernels.
    if _rolled() and not _pallas_enabled():
        t = jax.lax.fori_loop(
            0,
            NUM_LIMBS,
            lambda i, tt: step(
                jax.lax.dynamic_slice_in_dim(a, i, 1, axis=a.ndim - 1), tt
            ),
            t,
        )
    else:
        for i in range(NUM_LIMBS):
            t = step(a[..., i : i + 1], t)
    t17 = _carry_prop(t, NUM_LIMBS + 1)
    return _cond_sub_p(t17, fc)


# ---------------------------------------------------------------------------
# public jitted ops
# ---------------------------------------------------------------------------


@functools.partial(fjit, static_argnums=0)
def add(fc: FieldConsts, a, b):
    """(a + b) mod p over (..., 16) canonical limb arrays."""
    return _add(fc, a, b)


@functools.partial(fjit, static_argnums=0)
def sub(fc: FieldConsts, a, b):
    """(a - b) mod p."""
    return _sub(fc, a, b)


@functools.partial(fjit, static_argnums=0)
def neg(fc: FieldConsts, a):
    z = jnp.zeros_like(a)
    return jnp.where(is_zero(a)[..., None], z, _sub(fc, z, a))


@functools.partial(fjit, static_argnums=0)
def mont_mul(fc: FieldConsts, a, b):
    """Montgomery product: (a * b * R^-1) mod p. Inputs/outputs canonical."""
    return _mont_mul(fc, a, b)


@functools.partial(fjit, static_argnums=0)
def mont_sqr(fc: FieldConsts, a):
    return _mont_mul(fc, a, a)


@functools.partial(fjit, static_argnums=0)
def to_mont(fc: FieldConsts, a):
    return _mont_mul(fc, a, jnp.broadcast_to(fc.r2_limbs, a.shape))


@functools.partial(fjit, static_argnums=0)
def from_mont(fc: FieldConsts, a):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return _mont_mul(fc, a, one)


def is_zero(a):
    """(...,) bool: whether the canonical limb value is zero."""
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def _pow_bits(fc, a, bits):
    """Square-and-multiply with a device bit array (LSB-first) via lax.scan."""
    acc0 = jnp.broadcast_to(fc.r_limbs, a.shape)  # 1 in Montgomery form

    def step(carry, bit):
        acc, sq = carry
        mul = _mont_mul(fc, acc, sq)
        acc = jnp.where(bit.astype(bool), mul, acc)
        sq = _mont_mul(fc, sq, sq)
        return (acc, sq), None

    (acc, _), _ = jax.lax.scan(step, (acc0, a), bits)
    return acc


def pow_const(fc: FieldConsts, a, e: int):
    """a^e for a static Python-int exponent; ``a`` Montgomery, result Montgomery."""
    if e == 0:
        return jnp.broadcast_to(fc.r_limbs, a.shape)
    bits = jnp.asarray(np.array([(e >> i) & 1 for i in range(e.bit_length())], np.uint32))
    return _pow_scan(fc, a, bits)


@functools.partial(fjit, static_argnums=0)
def _pow_scan(fc, a, bits):
    return _pow_bits(fc, a, bits)


@functools.partial(fjit, static_argnums=0)
def inv(fc: FieldConsts, a):
    """Batched field inverse via Fermat (a^(p-2)); Montgomery domain.

    a == 0 maps to 0.
    """
    return _pow_bits(fc, a, fc.p_minus_2_bits)


def batch_inv_nz(fc: FieldConsts, a):
    """Batched inverse via the Montgomery trick — x_i^{-1} =
    (Π_{j<i} x_j)·(Π_{j>i} x_j)·(Π_j x_j)^{-1}: two log-depth prefix scans
    + ONE 253-bit Fermat ladder on a single element, ~10x fewer muls than
    the per-element ladder of :func:`inv`.

    REQUIRES every element nonzero (one zero poisons the whole batch) —
    callers are prover-internal denominators that are nonzero with
    overwhelming probability over the verifier's challenges. Montgomery
    domain in/out; arbitrary batch shape (..., 16)."""
    shape = a.shape
    m = a.reshape(-1, NUM_LIMBS)
    pre = prefix_mul(fc, m)  # inclusive prefix products
    total = pre[-1]
    tinv = _pow_bits(fc, total[None], fc.p_minus_2_bits)
    one = jnp.asarray(from_ints_np(fc, [1], mont=True))
    pre_excl = jnp.concatenate([one, pre[:-1]], axis=0)
    suf_incl = prefix_mul(fc, m[::-1])[::-1]
    suf_excl = jnp.concatenate([suf_incl[1:], one], axis=0)
    out = _mont_mul(
        fc, _mont_mul(fc, pre_excl, suf_excl), jnp.broadcast_to(tinv, m.shape)
    )
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# log-depth scans (one arithmetic-op instance in the compiled graph)
# ---------------------------------------------------------------------------


def _hs_scan(op, fill, vals, reverse: bool = False):
    """Inclusive Hillis-Steele scan along axis -2 of (..., N, 16) limb
    arrays (leading axes batch).

    ``op(a, b)`` is the combiner; ``fill`` the identity row (16,). One
    combiner instance inside a fori_loop regardless of N."""
    n = vals.shape[-2]
    if n <= 1:
        return vals
    steps = (n - 1).bit_length()
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(s, acc):
        d = jnp.int32(1) << s
        if reverse:
            src = jnp.minimum(iota + d, n - 1)
            live = iota + d <= n - 1
        else:
            src = jnp.maximum(iota - d, 0)
            live = iota >= d
        shifted = jnp.where(live[:, None], jnp.take(acc, src, axis=-2), fill)
        return op(acc, shifted)

    return jax.lax.fori_loop(0, steps, body, vals)


def prefix_mul(fc: FieldConsts, vals_mont):
    """Inclusive prefix product (Montgomery) along axis -2 (leading batch)."""
    one = jnp.asarray(from_ints_np(fc, [1], mont=True))[0]
    return _hs_scan(lambda a, b: _mont_mul(fc, a, b), one, vals_mont)


def prefix_add(fc: FieldConsts, vals):
    """Inclusive prefix sum mod p along axis -2 (leading batch)."""
    zero = jnp.zeros((NUM_LIMBS,), _U32)
    return _hs_scan(lambda a, b: _add(fc, a, b), zero, vals)


def suffix_add(fc: FieldConsts, vals):
    """s_i = sum_{j >= i} vals_j (mod p) along axis -2 (leading batch)."""
    zero = jnp.zeros((NUM_LIMBS,), _U32)
    return _hs_scan(lambda a, b: _add(fc, a, b), zero, vals, reverse=True)


def reduce_add(fc: FieldConsts, vals):
    """Sum along axis 0 of (N, ..., 16) limb arrays, mod p — log-depth
    halving fold, Python-unrolled so every level processes only the
    surviving half (total traffic ~2x the input, vs log2(N)x for a
    masked fixed-shape fold)."""
    n = vals.shape[0]
    while n > 1:
        half = n // 2
        merged = _add(fc, vals[:half], vals[half : 2 * half])
        if n % 2:
            merged = jnp.concatenate([merged, vals[2 * half :]], axis=0)
        vals = merged
        n = vals.shape[0]
    return vals[0]


@functools.partial(fjit, static_argnums=(0, 2))
def _pow_series_graph(fc, x_m, n: int):
    rows = jnp.broadcast_to(x_m, (n, NUM_LIMBS))
    one = jnp.asarray(from_ints_np(fc, [1], mont=True))
    rows = jnp.concatenate([one, rows[1:]], axis=0)
    return prefix_mul(fc, rows)


def pow_series(fc: FieldConsts, x_int: int, n: int):
    """[x^0, x^1, ..., x^{n-1}] as a device (n, 16) Montgomery array.

    Device-side log-depth build (prefix product of x rows). The base enters
    as an ARRAY argument of a jitted graph — baking it in as a constant
    would re-trace (and re-lower the Pallas mul) on every transcript
    challenge, which profiling showed dominating whole prover rounds."""
    x_m = jnp.asarray(from_ints_np(fc, [x_int % fc.field.p], mont=True))[0]
    return _pow_series_graph(fc, x_m, max(n, 1))


# ---------------------------------------------------------------------------
# host conversion helpers
# ---------------------------------------------------------------------------


def from_ints_np(fc: FieldConsts, xs, mont: bool = True) -> np.ndarray:
    """Python ints -> host numpy limb array (safe inside jit traces)."""
    field = fc.field
    if mont:
        xs = [field.to_mont(x % field.p) for x in xs]
    else:
        xs = [x % field.p for x in xs]
    arr = np.empty((len(xs), NUM_LIMBS), np.uint32)
    for j, x in enumerate(xs):
        for i in range(NUM_LIMBS):
            arr[j, i] = x & LIMB_MASK
            x >>= LIMB_BITS
    return arr


def from_ints(fc: FieldConsts, xs, mont: bool = True):
    """Python ints -> device limb array, optionally in Montgomery form."""
    return jnp.asarray(from_ints_np(fc, xs, mont))


def to_ints(fc: FieldConsts, arr, mont: bool = True) -> list[int]:
    """Device limb array (..., 16) -> list of Python ints (standard form)."""
    arr = np.asarray(arr)
    field = fc.field
    out = []
    flat = arr.reshape(-1, NUM_LIMBS)
    for row in flat:
        x = 0
        for i in reversed(range(NUM_LIMBS)):
            x = (x << LIMB_BITS) | int(row[i])
        out.append(field.from_mont(x) if mont else x)
    return out
