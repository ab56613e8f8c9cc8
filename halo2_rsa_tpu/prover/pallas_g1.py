"""Fused Pallas TPU kernels for BN254 G1 point addition / doubling.

The MSM bucket pipeline (:mod:`.msm`) is built from complete-formula point
adds; composed from individual field ops each add costs ~12 Montgomery-mul
kernel launches plus a dozen XLA add/sub passes over HBM. These kernels hold
the ENTIRE Renes–Costello–Batina formula (algorithms 7/9, a=0, b3=9) in
VMEM: six coordinate blocks stream in, three stream out, one launch — the
HBM traffic per point-add drops to the 9-coordinate minimum.

Layout matches :mod:`..fields.pallas_mont`: limb-major (16, N) blocks, batch
along VPU lanes; field elements inside the kernel are 16 Python-level rows
of (BN,) uint32 (see `_cios_rows`/`_add_rows`/`_sub_rows` there).

Dispatch: :func:`..prover.g1_vec.point_add` routes large non-vmapped batches
here when the Pallas path is enabled (same policy as ``vecfield._mont_mul``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import NUM_LIMBS
from ..fields.pallas_mont import (
    BLOCK_N,
    _add_rows,
    _cios_rows,
    _sub_rows,
)
from ..fields.vecfield import FieldConsts


def _mul9_rows(a, p_limbs):
    d = _add_rows(a, a, p_limbs)  # 2a
    d = _add_rows(d, d, p_limbs)  # 4a
    d = _add_rows(d, d, p_limbs)  # 8a
    return _add_rows(d, a, p_limbs)


def _point_add_kernel(p_limbs, n0inv, x1r, y1r, z1r, x2r, y2r, z2r,
                      x3r, y3r, z3r):
    """RCB15 algorithm 7 (a=0, b3=9), mirroring g1_vec.point_add."""
    ld = lambda ref: [ref[i, :] for i in range(NUM_LIMBS)]
    x1, y1, z1 = ld(x1r), ld(y1r), ld(z1r)
    x2, y2, z2 = ld(x2r), ld(y2r), ld(z2r)
    mul = lambda a, b: _cios_rows(a, b, p_limbs, n0inv)
    add = lambda a, b: _add_rows(a, b, p_limbs)
    sub = lambda a, b: _sub_rows(a, b, p_limbs)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = sub(mul(add(x1, y1), add(x2, y2)), add(t0, t1))  # X1Y2 + X2Y1
    t4 = sub(mul(add(y1, z1), add(y2, z2)), add(t1, t2))  # Y1Z2 + Y2Z1
    t5 = sub(mul(add(x1, z1), add(x2, z2)), add(t0, t2))  # X1Z2 + X2Z1
    trip0 = add(add(t0, t0), t0)  # 3*X1X2
    b3z = _mul9_rows(t2, p_limbs)  # b3*Z1Z2
    z3t = add(t1, b3z)
    t1 = sub(t1, b3z)
    y3t = _mul9_rows(t5, p_limbs)  # b3*(X1Z2 + X2Z1)

    m0 = mul(t4, y3t)
    m1 = mul(t3, t1)
    m2 = mul(y3t, trip0)
    m3 = mul(t1, z3t)
    m4 = mul(trip0, t3)
    m5 = mul(z3t, t4)
    x3 = sub(m1, m0)
    y3 = add(m3, m2)
    z3 = add(m5, m4)
    for j in range(NUM_LIMBS):
        x3r[j, :] = x3[j]
        y3r[j, :] = y3[j]
        z3r[j, :] = z3[j]


def _point_add_mixed_kernel(p_limbs, n0inv, x1r, y1r, z1r, x2r, y2r,
                            x3r, y3r, z3r):
    """RCB15 algorithm 8 (a=0, b3=9, Z2=1): P1 projective + P2 AFFINE.

    Complete for any P1 (including the identity) as long as P2 is a real
    affine point — the MSM bucket scan's shape when the base points are the
    affine SRS powers (``z_one``). 11 muls vs algorithm 7's 12, ~30% fewer
    adds, and one fewer input coordinate stream."""
    ld = lambda ref: [ref[i, :] for i in range(NUM_LIMBS)]
    x1, y1, z1 = ld(x1r), ld(y1r), ld(z1r)
    x2, y2 = ld(x2r), ld(y2r)
    mul = lambda a, b: _cios_rows(a, b, p_limbs, n0inv)
    add = lambda a, b: _add_rows(a, b, p_limbs)
    sub = lambda a, b: _sub_rows(a, b, p_limbs)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = sub(mul(add(x2, y2), add(x1, y1)), add(t0, t1))  # X1Y2 + X2Y1
    t4 = add(mul(y2, z1), y1)  # Y1 + Y2Z1
    y3 = add(mul(x2, z1), x1)  # X1 + X2Z1
    trip0 = add(add(t0, t0), t0)  # 3*X1X2
    t2 = _mul9_rows(z1, p_limbs)  # b3*Z1
    z3t = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = _mul9_rows(y3, p_limbs)  # b3*(X1 + X2Z1)

    m0 = mul(t4, y3)
    m1 = mul(t3, t1)
    m2 = mul(y3, trip0)
    m3 = mul(t1, z3t)
    m4 = mul(trip0, t3)
    m5 = mul(z3t, t4)
    x3 = sub(m1, m0)
    y3o = add(m3, m2)
    z3 = add(m5, m4)
    for j in range(NUM_LIMBS):
        x3r[j, :] = x3[j]
        y3r[j, :] = y3o[j]
        z3r[j, :] = z3[j]


def _point_double_kernel(p_limbs, n0inv, xr, yr, zr, x3r, y3r, z3r):
    """RCB15 algorithm 9 (a=0, b3=9), mirroring g1_vec.point_double."""
    ld = lambda ref: [ref[i, :] for i in range(NUM_LIMBS)]
    x, y, z = ld(xr), ld(yr), ld(zr)
    mul = lambda a, b: _cios_rows(a, b, p_limbs, n0inv)
    add = lambda a, b: _add_rows(a, b, p_limbs)
    sub = lambda a, b: _sub_rows(a, b, p_limbs)

    t0 = mul(y, y)
    t1 = mul(y, z)
    t2 = mul(z, z)
    xy = mul(x, y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)  # 8Y^2
    t2 = _mul9_rows(t2, p_limbs)  # b3*Z^2
    y3 = add(t0, t2)
    t0 = sub(t0, add(add(t2, t2), t2))
    x3 = mul(t2, z3)
    z3b = mul(t1, z3)
    y3b = mul(t0, y3)
    y3 = add(x3, y3b)
    x3 = mul(t0, xy)
    x3 = add(x3, x3)
    for j in range(NUM_LIMBS):
        x3r[j, :] = x3[j]
        y3r[j, :] = y3[j]
        z3r[j, :] = z3b[j]


@functools.lru_cache(maxsize=None)
def _build_call(kind: str, p_limbs: tuple, n0inv: int, n: int, block: int,
                interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // block,)
    if kind == "add":
        kern = functools.partial(_point_add_kernel, p_limbs, np.uint32(n0inv))
        n_in = 6
    elif kind == "madd":
        kern = functools.partial(
            _point_add_mixed_kernel, p_limbs, np.uint32(n0inv)
        )
        n_in = 5
    else:
        kern = functools.partial(_point_double_kernel, p_limbs, np.uint32(n0inv))
        n_in = 3
    spec = pl.BlockSpec(
        (NUM_LIMBS, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((NUM_LIMBS, n), jnp.uint32)
    call = pl.pallas_call(
        kern,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )
    # fjit, not jax.jit: interpret mode inlines the ~8k-op kernel body into
    # an XLA:CPU graph whose `fusion` pass is superlinear (see utils.xjit)
    from ..utils.xjit import fjit

    return fjit(call)


# point-add kernels hold ~3x the live rows of a bare mont_mul; half the
# block keeps VMEM pressure comparable
_G1_BLOCK = max(BLOCK_N // 2, 128)


def _to_kernel_layout(coords, batch, interpret: bool):
    """Broadcast + flatten (...,16) coords to (16, Npad); returns arrays+n."""
    flat = [
        jnp.broadcast_to(c, batch + (NUM_LIMBS,)).reshape(-1, NUM_LIMBS)
        for c in coords
    ]
    n = flat[0].shape[0]
    # interpret mode (CPU parity tests) has no tiling constraint and pays
    # per-element interpreter cost — keep the padded width minimal there
    min_granule = 8 if interpret else 128
    granule = _G1_BLOCK if n >= _G1_BLOCK else min_granule
    npad = -n % granule
    if npad:
        pad = jnp.zeros((npad, NUM_LIMBS), jnp.uint32)
        flat = [jnp.concatenate([c, pad], axis=0) for c in flat]
    return [jnp.transpose(c, (1, 0)) for c in flat], n, granule


def point_add_pallas(fq: FieldConsts, p1, p2, interpret: bool | None = None):
    """Fused complete addition on (..., 16)-coord projective point batches."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = jnp.broadcast_shapes(*[c.shape[:-1] for c in p1 + p2])
    arrs, n, granule = _to_kernel_layout(list(p1) + list(p2), batch, interpret)
    call = _build_call(
        "add", tuple(int(x) for x in fq.p_limbs), int(fq.n0inv),
        arrs[0].shape[1], min(granule, _G1_BLOCK), interpret,
    )
    outs = call(*arrs)
    return tuple(
        jnp.transpose(o, (1, 0))[:n].reshape(batch + (NUM_LIMBS,)) for o in outs
    )


def point_add_mixed_pallas(fq: FieldConsts, p1, p2xy,
                           interpret: bool | None = None):
    """Fused mixed addition: projective p1 + affine (x2, y2) batches."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    coords = list(p1) + list(p2xy)
    batch = jnp.broadcast_shapes(*[c.shape[:-1] for c in coords])
    arrs, n, granule = _to_kernel_layout(coords, batch, interpret)
    call = _build_call(
        "madd", tuple(int(x) for x in fq.p_limbs), int(fq.n0inv),
        arrs[0].shape[1], min(granule, _G1_BLOCK), interpret,
    )
    outs = call(*arrs)
    return tuple(
        jnp.transpose(o, (1, 0))[:n].reshape(batch + (NUM_LIMBS,)) for o in outs
    )


def point_double_pallas(fq: FieldConsts, p, interpret: bool | None = None):
    """Fused doubling on (..., 16)-coord projective point batches."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = jnp.broadcast_shapes(*[c.shape[:-1] for c in p])
    arrs, n, granule = _to_kernel_layout(list(p), batch, interpret)
    call = _build_call(
        "double", tuple(int(x) for x in fq.p_limbs), int(fq.n0inv),
        arrs[0].shape[1], min(granule, _G1_BLOCK), interpret,
    )
    outs = call(*arrs)
    return tuple(
        jnp.transpose(o, (1, 0))[:n].reshape(batch + (NUM_LIMBS,)) for o in outs
    )
