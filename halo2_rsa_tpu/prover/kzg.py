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
from ..fields.field import BN254_FR
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


def fixed_base_mul_batch(scalars_int: list[int], base=curve.G1_GEN):
    """[s_i * base] for many scalars: device double-and-add over shared
    precomputed base powers (254 vectorized select+add steps)."""
    n_bits = 254
    powers = []
    p = base
    for _ in range(n_bits):
        powers.append(p)
        p = curve.g1_add(p, p)
    base_dev = g1_vec.points_to_device(powers)  # (254, 16) coords
    sc = vecfield.from_ints(FR, scalars_int, mont=False)  # (N, 16)
    bits = []
    for b in range(n_bits):
        limb, off = divmod(b, 16)
        bits.append((sc[:, limb] >> off) & 1)
    bits = jnp.stack(bits, 0).astype(bool)  # (254, N)

    @fjit
    def run(bits, base_dev):
        n = bits.shape[1]
        acc0 = identity((n,))

        def step(acc, inp):
            bit, bp = inp
            bp_b = tuple(jnp.broadcast_to(c[None], (n, 16)) for c in bp)
            added = point_add(acc, bp_b)
            return point_select(bit, added, acc), None

        acc, _ = jax.lax.scan(step, acc0, (bits, base_dev))
        return acc

    return run(bits, base_dev)


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
