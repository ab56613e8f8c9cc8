"""Vectorized BN254 G1 arithmetic for TPU.

Points in homogeneous projective coordinates (X, Y, Z) over Fq, limbs in the
trailing axis, batch dims leading. Uses the Renes–Costello–Batina *complete*
addition/doubling formulas for a=0 curves (no branches, infinity = (0,1,0)
handled uniformly) — exactly what SIMD/Pallas execution needs: every lane
runs the same instruction stream regardless of special cases.

Field ops come from ``fields.vecfield`` (Montgomery, 16x16-bit limbs).
All coordinates are kept in the Montgomery domain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import vecfield
from ..fields.field import BN254_FQ, NUM_LIMBS
from ..fields.vecfield import _add, _mont_mul, _sub
from . import curve

FQ = vecfield.consts(BN254_FQ)

# b3 = 3*b = 9 for y^2 = x^3 + 3


def _mul9(a):
    """9*a via adds (cheaper than a Montgomery mul)."""
    d = _add(FQ, a, a)  # 2a
    d = _add(FQ, d, d)  # 4a
    d = _add(FQ, d, d)  # 8a
    return _add(FQ, d, a)


def _mul_many(lhs, rhs):
    """Batch k independent Montgomery muls into one stacked call.

    The mul operands are stacked along a new leading axis so the expensive
    unrolled CIOS graph appears ONCE (on a k-times-larger batch) instead of
    k times — smaller HLO, fuller vector lanes."""
    a = jnp.stack(jnp.broadcast_arrays(*lhs), axis=0)
    b = jnp.stack(jnp.broadcast_arrays(*rhs), axis=0)
    out = _mont_mul(FQ, a, b)
    return tuple(out[i] for i in range(len(lhs)))


def _pallas_point_dispatch(coords) -> bool:
    """Route to the fused whole-formula Pallas kernel? Same policy as
    ``vecfield._mont_mul``: pallas mode on, large static batch, not vmapped."""
    if not vecfield._pallas_enabled():
        return False
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # private path moved in a JAX upgrade: XLA fallback
        return False

    if any(isinstance(c, BatchTracer) for c in coords):
        return False
    batch = jnp.broadcast_shapes(*[c.shape[:-1] for c in coords])
    size = 1
    for d in batch:
        size *= d
    return size >= vecfield._PALLAS_MIN_BATCH


def point_add(p1, p2):
    """Complete projective addition (RCB15 algorithm 7, a=0).

    p = (X, Y, Z) tuple of (..., 16) arrays. 12 field muls, arranged as two
    6-way batched mul layers (the formula's dependency depth is 2) — or ONE
    fused Pallas kernel holding the whole formula for large batches.
    """
    if _pallas_point_dispatch(tuple(p1) + tuple(p2)):
        from . import pallas_g1

        return pallas_g1.point_add_pallas(FQ, p1, p2)
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    # layer 1: all pairwise products are independent
    t0, t1, t2, t3, t4, t5 = _mul_many(
        (x1, y1, z1, _add(FQ, x1, y1), _add(FQ, y1, z1), _add(FQ, x1, z1)),
        (x2, y2, z2, _add(FQ, x2, y2), _add(FQ, y2, z2), _add(FQ, x2, z2)),
    )
    t3 = _sub(FQ, t3, _add(FQ, t0, t1))  # X1Y2 + X2Y1
    t4 = _sub(FQ, t4, _add(FQ, t1, t2))  # Y1Z2 + Y2Z1
    t5 = _sub(FQ, t5, _add(FQ, t0, t2))  # X1Z2 + X2Z1
    trip0 = _add(FQ, _add(FQ, t0, t0), t0)  # 3*X1X2
    b3z = _mul9(t2)  # b3*Z1Z2
    z3 = _add(FQ, t1, b3z)
    t1 = _sub(FQ, t1, b3z)
    y3 = _mul9(t5)  # b3*(X1Z2 + X2Z1)
    # layer 2: six more independent products
    m0, m1, m2, m3, m4, m5 = _mul_many(
        (t4, t3, y3, t1, trip0, z3),
        (y3, t1, trip0, z3, t3, t4),
    )
    x3 = _sub(FQ, m1, m0)
    y3 = _add(FQ, m3, m2)
    z3 = _add(FQ, m5, m4)
    return (x3, y3, z3)


def point_add_mixed(p1, p2xy):
    """Mixed addition: projective p1 + AFFINE p2 = (x2, y2) (RCB15
    algorithm 8, a=0). Complete for any p1 — including the identity —
    provided p2 is a real affine point. 11 muls vs 12 for the general
    formula, one fewer coordinate stream. Used by the MSM bucket scan when
    the base points are the affine SRS powers (``z_one``)."""
    if _pallas_point_dispatch(tuple(p1) + tuple(p2xy)):
        from . import pallas_g1

        return pallas_g1.point_add_mixed_pallas(FQ, p1, p2xy)
    x1, y1, z1 = p1
    x2, y2 = p2xy
    t0, t1, t3, ty, tx = _mul_many(
        (x1, y1, _add(FQ, x2, y2), y2, x2),
        (x2, y2, _add(FQ, x1, y1), z1, z1),
    )
    t3 = _sub(FQ, t3, _add(FQ, t0, t1))  # X1Y2 + X2Y1
    t4 = _add(FQ, ty, y1)  # Y1 + Y2Z1
    y3 = _add(FQ, tx, x1)  # X1 + X2Z1
    trip0 = _add(FQ, _add(FQ, t0, t0), t0)  # 3*X1X2
    t2 = _mul9(z1)  # b3*Z1
    z3 = _add(FQ, t1, t2)
    t1 = _sub(FQ, t1, t2)
    y3 = _mul9(y3)  # b3*(X1 + X2Z1)
    m0, m1, m2, m3, m4, m5 = _mul_many(
        (t4, t3, y3, t1, trip0, z3),
        (y3, t1, trip0, z3, t3, t4),
    )
    x3 = _sub(FQ, m1, m0)
    y3 = _add(FQ, m3, m2)
    z3 = _add(FQ, m5, m4)
    return (x3, y3, z3)


def point_double(p):
    """Complete projective doubling (RCB15 algorithm 9, a=0). 7 muls in
    three batched layers, or one fused Pallas kernel for large batches."""
    if _pallas_point_dispatch(tuple(p)):
        from . import pallas_g1

        return pallas_g1.point_double_pallas(FQ, p)
    x, y, z = p
    t0, t1, t2, xy = _mul_many((y, y, z, x), (y, z, z, y))
    z3 = _add(FQ, t0, t0)
    z3 = _add(FQ, z3, z3)
    z3 = _add(FQ, z3, z3)  # 8Y^2
    t2 = _mul9(t2)  # b3*Z^2
    y3 = _add(FQ, t0, t2)
    t0 = _sub(FQ, t0, _add(FQ, _add(FQ, t2, t2), t2))
    x3, z3, y3b = _mul_many((t2, t1, t0), (z3, z3, y3))
    y3 = _add(FQ, x3, y3b)
    x3, = _mul_many((t0,), (xy,))
    x3 = _add(FQ, x3, x3)
    return (x3, y3, z3)


def point_neg(p):
    """-P = (X, -Y, Z); the identity (0, λ, 0) stays a valid identity rep."""
    x, y, z = p
    return (x, _sub(FQ, jnp.zeros_like(y), y), z)


def point_select(mask, p_true, p_false):
    """Elementwise select between two point batches; mask (...,) bool."""
    m = mask[..., None]
    return tuple(jnp.where(m, a, b) for a, b in zip(p_true, p_false))


def identity(batch_shape=()):
    """(0, 1, 0) in Montgomery form, broadcast to batch_shape."""
    zero = jnp.zeros(batch_shape + (NUM_LIMBS,), jnp.uint32)
    one_m = jnp.broadcast_to(jnp.asarray(FQ.r_limbs), batch_shape + (NUM_LIMBS,))
    return (zero, one_m, zero)


def is_identity(p):
    """(...,) bool: Z == 0."""
    return vecfield.is_zero(p[2])


def points_to_affine(p):
    """Projective (X, Y, Z) coord tuple of (..., 16) -> (X/Z, Y/Z, 1).

    REQUIRES Z != 0 everywhere (one batched inversion); used to normalize
    the SRS powers once so every commit MSM can skip the Z gather
    (``msm_many(..., z_one=True)``)."""
    x, y, z = p
    zinv = vecfield.batch_inv_nz(FQ, z)
    one = jnp.broadcast_to(jnp.asarray(FQ.r_limbs), z.shape)
    return (
        vecfield._mont_mul(FQ, x, zinv),
        vecfield._mont_mul(FQ, y, zinv),
        one,
    )


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def points_to_device(points) -> tuple:
    """List of host affine points (x, y) or None -> projective device arrays.

    Infinity becomes (0, 1, 0)."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return (
        vecfield.from_ints(FQ, xs),
        vecfield.from_ints(FQ, ys),
        vecfield.from_ints(FQ, zs),
    )


def points_from_device(p) -> list:
    """Projective device arrays -> list of host affine points (or None).

    One stacked device->host transfer (a sync round trip costs ~25 ms on
    tunneled setups; three per call tripled it)."""
    stacked = np.asarray(jnp.stack([c.reshape(-1, 16) for c in p]))
    return points_from_host_stack(stacked)


def points_from_host_stack(stacked: np.ndarray) -> list:
    """Host (3, N, 16) Montgomery-limb coord stack -> affine points."""
    xs = vecfield.to_ints(FQ, stacked[0])
    ys = vecfield.to_ints(FQ, stacked[1])
    zs = vecfield.to_ints(FQ, stacked[2])
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(z, -1, curve.Q)
            out.append((x * zinv % curve.Q, y * zinv % curve.Q))
    return out
