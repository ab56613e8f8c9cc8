"""KZG polynomial commitments over BN254.

Capability equivalent of halo2's ``ParamsKZG``/``KZGCommitmentScheme``
(/root/reference/benches/bench.rs:228-239, 319-343): SRS setup, MSM-based
commit, single-point open via synthetic division, pairing verification.

TPU mapping: commit = Pippenger MSM (msm.py); the quotient (p(X)-p(z))/(X-z)
is computed with a fully vectorized suffix-scan (log N modular-add rounds)
instead of the sequential Horner recurrence; SRS powers are generated with a
device-side fixed-base batched double-and-add. Pairings (2 per verify) run
host-side (curve.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import vecfield
from ..utils.xjit import fjit
from ..fields.field import BN254_FR, NUM_LIMBS
from ..fields.vecfield import add as _vadd, mont_mul as _vmul
from . import curve, g1_vec, msm
from .g1_vec import FQ, identity, point_add, point_select

FR = vecfield.consts(BN254_FR)
R = BN254_FR.p


@dataclasses.dataclass
class SRS:
    """Powers of tau. g1_powers: device projective arrays (N,16)x3 (Montgomery);
    g2_gen / g2_tau: host G2 affine points."""

    n: int
    g1_powers: tuple
    g2_gen: tuple
    g2_tau: tuple

    def g1_affine(self) -> list:
        return g1_vec.points_from_device(self.g1_powers)


# Fixed-base segment length: one compiled (and AOT-cached) class serves
# every SRS size >= 2^15 — k=15..18 all reuse the same executable.
_FB_SEG = 1 << 15


@fjit
def _fb_table(base_dev):
    """(32,16)x3 window bases B_w = 2^{8w}*G -> (32,256,16)x3 tables
    T[w,j] = j*B_w, built by one 256-step scan of 32-wide point adds."""

    def step(prev, _):
        return point_add(prev, base_dev), prev

    _, rows = jax.lax.scan(step, identity((32,)), None, length=256)
    return tuple(jnp.swapaxes(r, 0, 1) for r in rows)  # (32,256,16)


@fjit
def _fb_mul(sc, table):
    """(N,16) standard-form scalars x (32,256,16)x3 tables -> N*base.

    Windowed fixed-base: 32 gather+add steps per point (vs 254
    select+add for bitwise double-and-add) — ~8x less EC work; the
    complete RCB15 add absorbs the digit-0 identity rows uniformly."""
    from .msm import digits_from_scalar_limbs

    digs = digits_from_scalar_limbs(sc, 8)  # (32, N)
    n = sc.shape[0]

    def step(acc, inp):
        dig, tx, ty, tz = inp  # (N,), (256,16)x3
        return point_add(acc, (tx[dig], ty[dig], tz[dig])), None

    acc, _ = jax.lax.scan(step, identity((n,)), (digs,) + tuple(table))
    return acc


def fixed_base_mul_batch(scalars_int: list[int], base=curve.G1_GEN):
    """[s_i * base] for many scalars: windowed fixed-base table on device,
    processed in fixed 2^15-point segments (one compiled class for all k)."""
    wbases = []
    p = base
    for _ in range(32):
        wbases.append(p)
        for _ in range(8):
            p = curve.g1_add(p, p)
    base_dev = g1_vec.points_to_device(wbases)  # (32,16)x3
    table = _fb_table(base_dev)

    n_total = len(scalars_int)
    seg = min(_FB_SEG, max(32, 1 << (n_total - 1).bit_length()))
    outs = []
    for s in range(0, n_total, seg):
        chunk = scalars_int[s : s + seg]
        m = len(chunk)
        sc = vecfield.from_ints(FR, chunk, mont=False)
        if m < seg:
            sc = jnp.concatenate(
                [sc, jnp.zeros((seg - m, NUM_LIMBS), jnp.uint32)], axis=0
            )
        acc = _fb_mul(sc, table)
        outs.append(tuple(c[:m] for c in acc))
    if len(outs) == 1:
        return outs[0]
    return tuple(jnp.concatenate([o[c] for o in outs], axis=0) for c in range(3))


def setup(n: int, tau: int | None = None, seed: int = 0) -> SRS:
    """Generate an SRS with ``n`` G1 powers (ParamsKZG::setup analog)."""
    import random

    if tau is None:
        tau = random.Random(seed).randrange(1, R)
    powers = [1] * n
    for i in range(1, n):
        powers[i] = powers[i - 1] * tau % R
    # normalized to affine (Z == 1): commit MSMs rely on it to skip the Z
    # gather (msm_many z_one=True); powers of tau are never the identity
    g1_powers = g1_vec.points_to_affine(fixed_base_mul_batch(powers))
    g2_tau = curve.g2_mul(curve.G2_GEN, tau)
    return SRS(n=n, g1_powers=g1_powers, g2_gen=curve.G2_GEN, g2_tau=g2_tau)


def commit(srs: SRS, coeffs):
    """Commit to a polynomial. ``coeffs``: (N,16) standard-form Fr limbs
    (device) or a list of ints. Returns host affine point."""
    if isinstance(coeffs, (list, tuple)):
        coeffs = vecfield.from_ints(FR, list(coeffs), mont=False)
    k = coeffs.shape[0]
    pts = tuple(c[:k] for c in srs.g1_powers)
    res = msm.msm(coeffs, pts, z_one=True)
    return g1_vec.points_from_device(tuple(c[None] for c in res))[0]


@fjit
def _suffix_sums(c):
    """s_i = sum_{j >= i} c_j (mod r), log-depth, one add instance."""
    return vecfield.suffix_add(FR, c)


@fjit
def _quotient_graph(coeffs_mont, zp, zip_):
    c = _vmul(FR, coeffs_mont, zp)  # a_j z^j (Montgomery)
    s = vecfield.suffix_add(FR, c)
    s_next = jnp.concatenate([s[1:], jnp.zeros((1, 16), jnp.uint32)], axis=0)
    q = _vmul(FR, s_next, zip_)
    return q, s[0]


def quotient_poly(coeffs_mont, z: int):
    """(q_coeffs_mont, p_z): q(X) = (p(X) - p(z)) / (X - z).

    b_i = z^{-(i+1)} * sum_{j > i} a_j z^j — all vectorized; the power
    series are built on-device at log depth (no O(n) host bigint loops).
    ``coeffs_mont``: (N,16) Montgomery Fr limbs.
    """
    n = coeffs_mont.shape[0]
    zp = vecfield.pow_series(FR, z, n)
    z_inv = pow(z, -1, R)
    # z^{-(i+1)} = z_inv * z_inv^i
    zi0 = jnp.asarray(vecfield.from_ints_np(FR, [z_inv], mont=True))
    zip_ = _vmul(FR, vecfield.pow_series(FR, z_inv, n), jnp.broadcast_to(zi0, (n, 16)))
    q, p_z_mont = _quotient_graph(coeffs_mont, zp, zip_)
    p_z = vecfield.to_ints(FR, p_z_mont[None], mont=True)[0]
    return q, p_z


def open_at(srs: SRS, coeffs, z: int):
    """Produce an opening proof for p at z. ``coeffs``: list of ints or
    (N,16) standard-form device array. Returns (v = p(z), pi affine)."""
    if isinstance(coeffs, (list, tuple)):
        coeffs_std = vecfield.from_ints(FR, list(coeffs), mont=False)
    else:
        coeffs_std = coeffs
    coeffs_mont = vecfield.to_mont(FR, coeffs_std)
    q_mont, v = quotient_poly(coeffs_mont, z)
    q_std = vecfield.from_mont(FR, q_mont)
    k = q_std.shape[0]
    pi = msm.msm(q_std, tuple(c[:k] for c in srs.g1_powers), z_one=True)
    pi_aff = g1_vec.points_from_device(tuple(c[None] for c in pi))[0]
    return v, pi_aff


def verify_open(srs: SRS, commitment, z: int, v: int, pi) -> bool:
    """Check e(pi, [tau - z]_2) == e(C - v*G1, [1]_2) via one pairing product."""
    c_minus_v = curve.g1_add(commitment, curve.g1_neg(curve.g1_mul(curve.G1_GEN, v)))
    tau_minus_z = curve.g2_add(srs.g2_tau, curve.g2_neg(curve.g2_mul(srs.g2_gen, z)))
    return curve.pairing_check(
        [(pi, tau_minus_z), (curve.g1_neg(c_minus_v), srs.g2_gen)]
    )
