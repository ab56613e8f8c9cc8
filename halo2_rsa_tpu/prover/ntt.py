"""Radix-2 NTT over BN254 Fr on TPU.

The transform behind halo2's polynomial arithmetic (column FFTs / quotient
computation inside ``create_proof``, /root/reference/benches/bench.rs:319-329).
BN254 Fr has 2-adicity 28, ample for the reference's k <= 18 circuits.

Formulation: bit-reverse gather, then log2(N) fully-vectorized butterfly
stages — each stage is one reshape + one batched Montgomery multiply by the
stage twiddles + add/sub. Static shapes throughout; stage twiddles are
precomputed per size on the host and cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import vecfield
from ..fields.field import BN254_FR
from ..fields.vecfield import _add, _mont_mul, _sub

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
def _twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle tables (Montgomery limb arrays, host numpy)."""
    n = 1 << log_n
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, R_MOD)
    # stage s in 1..log_n has m = 2^s, needs w_m^j for j < m/2 where
    # w_m = w^(n/m)
    tables = []
    for s in range(1, log_n + 1):
        m = 1 << s
        wm = pow(w, n // m, R_MOD)
        cur = 1
        tw = []
        for _ in range(m // 2):
            tw.append(cur)
            cur = cur * wm % R_MOD
        tables.append(vecfield.from_ints_np(FR, tw, mont=True))
    return tuple(tables)


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


def _ntt_graph(a, log_n: int, inverse: bool):
    n = 1 << log_n
    a = a[_bitrev(log_n)]
    tables = _twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << s
        tw = tables[s - 1]  # (m/2, 16)
        blk = a.reshape(n // m, m, 16)
        even = blk[:, : m // 2]
        odd = blk[:, m // 2 :]
        t = _mont_mul(FR, tw[None], odd)
        a = jnp.concatenate([_add(FR, even, t), _sub(FR, even, t)], axis=1).reshape(
            n, 16
        )
    if inverse:
        a = _mont_mul(FR, a, jnp.broadcast_to(jnp.asarray(_n_inv_mont(log_n)), a.shape))
    return a


@functools.partial(jax.jit, static_argnums=(1,))
def ntt(a, log_n: int):
    """Forward NTT. ``a`` (N, 16) Montgomery Fr limbs, N = 2^log_n."""
    return _ntt_graph(a, log_n, False)


@functools.partial(jax.jit, static_argnums=(1,))
def intt(a, log_n: int):
    """Inverse NTT (includes the 1/N scale)."""
    return _ntt_graph(a, log_n, True)


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
