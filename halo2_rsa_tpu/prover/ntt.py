"""Radix-2 NTT over BN254 Fr on TPU.

The transform behind halo2's polynomial arithmetic (column FFTs / quotient
computation inside ``create_proof``, /root/reference/benches/bench.rs:319-329).
BN254 Fr has 2-adicity 28, ample for the reference's k <= 18 circuits.

Formulation: **constant-geometry (Pease) decimation-in-frequency** — every
one of the log2(N) stages applies the *same* data movement:

    s_i = x_i + x_{i+N/2}
    d_i = (x_i - x_{i+N/2}) * W^{(i >> t) << t}
    x'  = interleave(s, d)

so the whole transform is one ``fori_loop`` whose body holds a single
butterfly (static shapes, one Montgomery-mul instance in the compiled
graph regardless of N — XLA compile time is O(1) in N). The natural-order
input comes out bit-reversed and is un-reversed with one final gather.
Twiddles W^e are assembled on the fly from two sqrt(N)-sized tables
(W^e = hi[e >> h] * lo[e & (2^h-1)]), keeping the constant footprint tiny.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import vecfield
from ..fields.field import BN254_FR
from ..fields.vecfield import _add, _mont_mul, _sub
from ..utils.xjit import fjit

FR = vecfield.consts(BN254_FR)
R_MOD = BN254_FR.p

TWO_ADICITY = 28


@functools.lru_cache(maxsize=None)
def _max_root() -> int:
    """An element of multiplicative order exactly 2^TWO_ADICITY."""
    odd = (R_MOD - 1) >> TWO_ADICITY
    g = 2
    while True:
        c = pow(g, odd, R_MOD)
        if pow(c, 1 << (TWO_ADICITY - 1), R_MOD) != 1:
            return c
        g += 1


@functools.lru_cache(maxsize=None)
def root_of_unity(log_n: int) -> int:
    """Primitive 2^log_n-th root of unity in Fr."""
    assert log_n <= TWO_ADICITY
    return pow(_max_root(), 1 << (TWO_ADICITY - log_n), R_MOD)


@functools.lru_cache(maxsize=None)
def _twiddle_tables(log_n: int, inverse: bool):
    """Two-level twiddle tables for exponents < N/2 (host numpy, Montgomery).

    W^e = hi[e >> h] * lo[e & (2^h - 1)], each table ~sqrt(N/2) entries."""
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, R_MOD)
    ebits = max(log_n - 1, 1)  # exponents < 2^ebits
    h = (ebits + 1) // 2
    lo_size = 1 << h
    hi_size = 1 << (ebits - h)
    lo = [pow(w, j, R_MOD) for j in range(lo_size)]
    hi = [pow(w, j << h, R_MOD) for j in range(hi_size)]
    return (
        h,
        vecfield.from_ints_np(FR, lo, mont=True),
        vecfield.from_ints_np(FR, hi, mont=True),
    )


@functools.lru_cache(maxsize=None)
def _bitrev(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for i in range(log_n):
        rev |= ((idx >> i) & 1) << (log_n - 1 - i)
    return rev


@functools.lru_cache(maxsize=None)
def _n_inv_mont(log_n: int):
    n = 1 << log_n
    return vecfield.from_ints_np(FR, [pow(n, -1, R_MOD)], mont=True)[0]


_TW_FULL_CACHE: dict = {}

# Above this size the full stage-twiddle tensor stops being cheap HBM rent:
# at log_n=22 it is ~2.9 GB *per direction* (log_n * N/2 * 16 * 4 bytes), and
# the prover needs both directions for round 3 — beside a resident proving
# key that is exactly the k=18 OOM ef53871 fought. Fall back to on-the-fly
# sqrt-table assembly there (one extra mont_mul + two gathers per stage).
_TW_FULL_MAX_LOG_N = 20


def _twiddles_full(log_n: int, inverse: bool):
    """(log_n, N/2, 16) device tensor: stage t's butterfly twiddles
    W^{(i >> t) << t}, built ONCE per (log_n, direction) from the two
    sqrt-sized tables and cached on device (~150 MB at 2^18 — cheap HBM
    rent vs. a twiddle-assembly mul + two gathers in EVERY stage of every
    transform). Returns None above _TW_FULL_MAX_LOG_N (memory) or under an
    active trace (a cached tracer would poison every later eager call)."""
    if log_n > _TW_FULL_MAX_LOG_N:
        return None
    from jax._src.core import trace_state_clean

    if not trace_state_clean():
        return None
    key = (log_n, inverse)
    hit = _TW_FULL_CACHE.get(key)
    if hit is not None:
        return hit
    h, lo_tab, hi_tab = _twiddle_tables(log_n, inverse)
    half = 1 << (log_n - 1)
    iota = np.arange(half, dtype=np.int64)
    lo_tab = jnp.asarray(lo_tab)
    hi_tab = jnp.asarray(hi_tab)

    @functools.partial(fjit, static_argnums=())
    def build(lo_t, hi_t):
        rows = []
        for t in range(log_n):
            e = jnp.asarray((iota >> t) << t, dtype=jnp.int32)
            rows.append(_mont_mul(FR, hi_t[e >> h], lo_t[e & ((1 << h) - 1)]))
        return jnp.stack(rows)

    tw = build(lo_tab, hi_tab)
    _TW_FULL_CACHE[key] = tw
    return tw


def _ntt_graph(a, log_n: int, inverse: bool, tw_full=None):
    """Batched Pease NTT: ``a`` (P, N, 16); the P axis is explicitly batched
    through every butterfly (no vmap — keeps the fused Pallas field kernels
    on their primary path and the twiddle plan shared across the batch).
    ``tw_full``: optional (log_n, N/2, 16) precomputed stage twiddles (see
    :func:`_twiddles_full`); falls back to on-the-fly assembly from the
    sqrt tables (used inside shard_map bodies where the full tensor would
    be replicated per device)."""
    n = 1 << log_n
    p = a.shape[0]
    assert a.shape == (p, n, 16)
    if log_n == 0:
        return a
    half = n // 2
    if tw_full is None:
        h, lo_tab, hi_tab = _twiddle_tables(log_n, inverse)
        lo_tab = jnp.asarray(lo_tab)
        hi_tab = jnp.asarray(hi_tab)
        iota = jnp.arange(half, dtype=jnp.int32)
        lo_mask = jnp.int32((1 << h) - 1)

        def get_tw(t):
            e = (iota >> t) << t
            return _mont_mul(FR, hi_tab[e >> h], lo_tab[e & lo_mask])
    else:

        def get_tw(t):
            return jax.lax.dynamic_index_in_dim(tw_full, t, keepdims=False)

    def stage(t, x):
        top = x[:, :half]
        bot = x[:, half:]
        tw = get_tw(t)
        s = _add(FR, top, bot)
        d = _mont_mul(FR, _sub(FR, top, bot), tw[None])
        return jnp.stack([s, d], axis=2).reshape(p, n, 16)

    a = jax.lax.fori_loop(0, log_n, stage, a)
    a = a[:, _bitrev(log_n)]
    if inverse:
        a = _mont_mul(FR, a, jnp.broadcast_to(jnp.asarray(_n_inv_mont(log_n)), a.shape))
    return a


@functools.partial(fjit, static_argnums=(1, 2))
def _ntt_jit(a, log_n: int, inverse: bool, tw_full):
    return _ntt_graph(a, log_n, inverse, tw_full)


def ntt(a, log_n: int):
    """Forward NTT. ``a`` (N, 16) Montgomery Fr limbs, N = 2^log_n."""
    return _ntt_jit(a[None], log_n, False, _twiddles_full(log_n, False))[0]


def intt(a, log_n: int):
    """Inverse NTT (includes the 1/N scale)."""
    return _ntt_jit(a[None], log_n, True, _twiddles_full(log_n, True))[0]


def ntt_batch(a, log_n: int):
    """Forward NTT over a batch: ``a`` (P, N, 16), one shared twiddle plan."""
    return _ntt_jit(a, log_n, False, _twiddles_full(log_n, False))


def intt_batch(a, log_n: int):
    """Inverse NTT over a batch: ``a`` (P, N, 16)."""
    return _ntt_jit(a, log_n, True, _twiddles_full(log_n, True))


# --- host helpers -----------------------------------------------------------


def ntt_host(values: list[int], inverse: bool = False) -> list[int]:
    """O(N^2) host reference DFT over Fr."""
    n = len(values)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, R_MOD)
    out = []
    for i in range(n):
        acc = 0
        for j, v in enumerate(values):
            acc = (acc + v * pow(w, i * j, R_MOD)) % R_MOD
        out.append(acc)
    if inverse:
        n_inv = pow(n, -1, R_MOD)
        out = [x * n_inv % R_MOD for x in out]
    return out
