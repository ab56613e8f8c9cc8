"""Multi-scalar multiplication (Pippenger) on TPU.

The capability behind every KZG commitment (halo2's ``commit`` inside
``create_proof``, /root/reference/benches/bench.rs:319-329).

CPU Pippenger scatters points into buckets — a data-dependent access pattern
that is hostile to SIMD. The TPU-native formulation used here:

  1. extract c-bit digits from the scalar limbs for all windows (elementwise)
  2. per window, sort points by digit (XLA sort)                    [parallel]
  3. one scan over sorted positions with a running segment
     accumulator whose batch dimension is the windows — each step is a
     single vectorized complete point-add on all 32 windows at once;
     segment boundaries flush bucket totals                     [work-optimal:
     exactly N point-adds per window, like scalar Pippenger]
  4. scatter flushed totals into the bucket arrays (one scatter)
  5. batched running-sum over buckets (sum-of-suffix-sums trick), and a
     Horner combine over windows with c doublings per step.

Everything is jittable with static N; step 3's scan body is one fused
point-add kernel, so trace/compile cost is independent of N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import vecfield
from ..fields.field import NUM_LIMBS
from . import curve, g1_vec
from .g1_vec import FQ, identity, point_add, point_double, point_select

WINDOW_BITS = 8
NUM_WINDOWS = 256 // WINDOW_BITS  # Fr scalars < 2^254
NUM_BUCKETS = 1 << WINDOW_BITS


def digits_from_scalar_limbs(scalars):
    """(N, 16) uint32 standard-form Fr limbs -> (NUM_WINDOWS, N) int32 digits."""
    outs = []
    for j in range(NUM_LIMBS):
        limb = scalars[:, j]
        outs.append(limb & 0xFF)
        outs.append(limb >> 8)
    return jnp.stack(outs, axis=0).astype(jnp.int32)


def _bucket_sums(digits, points):
    """digits (W, N); points: projective tuple of (N, 16).

    Returns bucket sums as a tuple of (W, NUM_BUCKETS, 16) coords."""
    w, n = digits.shape
    order = jnp.argsort(digits, axis=1)  # (W, N)
    ds = jnp.take_along_axis(digits, order, axis=1)
    p_sorted = tuple(c[order] for c in points)  # (W, N, 16)

    # scan over sorted positions; batch dim = windows
    acc0 = identity((w,))
    d0 = jnp.full((w,), -1, jnp.int32)

    def step(carry, inp):
        acc, acc_d = carry
        d_i, p_i = inp  # (W,), (W, 16) coords
        same = d_i == acc_d
        combined = point_add(acc, p_i)
        new_acc = point_select(same, combined, p_i)
        flush_d = jnp.where(same, NUM_BUCKETS, acc_d)  # NUM_BUCKETS = trash
        return (new_acc, d_i), (flush_d, acc)

    xs = (jnp.moveaxis(ds, 1, 0), tuple(jnp.moveaxis(c, 1, 0) for c in p_sorted))
    (acc, acc_d), (flush_d, flush_p) = jax.lax.scan(step, (acc0, d0), xs)
    # append the final accumulator flush
    flush_d = jnp.concatenate([flush_d, acc_d[None]], axis=0)  # (N+1, W)
    flush_p = tuple(
        jnp.concatenate([c, a[None]], axis=0) for c, a in zip(flush_p, acc)
    )
    # initial dummy flush had digit -1 -> route to trash slot
    flush_d = jnp.where(flush_d < 0, NUM_BUCKETS, flush_d)

    # scatter per window: buckets[w, digit] = point
    buckets = identity((w, NUM_BUCKETS + 1))

    def scatter_one(bk, fd, fp):
        return tuple(b.at[fd].set(c, mode="drop") for b, c in zip(bk, fp))

    buckets = jax.vmap(scatter_one, in_axes=(0, 0, 0))(
        buckets,
        jnp.moveaxis(flush_d, 0, 1),  # (W, N+1)
        tuple(jnp.moveaxis(c, 0, 1) for c in flush_p),  # (W, N+1, 16)
    )
    return tuple(b[:, :NUM_BUCKETS] for b in buckets)


def _bucket_reduce(buckets):
    """(W, B, 16) coords -> per-window sums  sum_b b * bucket_b.

    Running-sum trick, scanned from the top bucket down; batch dim = windows.
    """
    w = buckets[0].shape[0]
    acc = identity((w,))
    total = identity((w,))
    rev = tuple(c[:, 1:][:, ::-1] for c in buckets)  # (W, B-1, 16)
    xs = tuple(jnp.moveaxis(c, 1, 0) for c in rev)  # (B-1, W, 16)

    def step(carry, x):
        acc, total = carry
        acc = point_add(acc, x)
        total = point_add(total, acc)
        return (acc, total), None

    (acc, total), _ = jax.lax.scan(step, (acc, total), xs)
    return total


def _window_combine(window_sums):
    """(W, 16) coords -> final point: Horner over windows, MSB window first."""
    res = identity(())

    def step(res, x):
        for _ in range(WINDOW_BITS):
            res = point_double(res)
        return point_add(res, x), None

    xs = tuple(c[::-1] for c in window_sums)  # top window first
    res, _ = jax.lax.scan(step, res, xs)
    return res


@jax.jit
def msm(scalars, points):
    """scalars (N, 16) uint32 standard-form Fr limbs; points: projective
    tuple of (N, 16) Montgomery Fq coords. Returns one projective point."""
    digits = digits_from_scalar_limbs(scalars)  # (W, N)
    buckets = _bucket_sums(digits, points)
    sums = _bucket_reduce(buckets)
    return _window_combine(sums)


def msm_host(scalars_int, points_affine):
    """Host reference (slow): sum of s_i * P_i with Python ints."""
    acc = None
    for s, p in zip(scalars_int, points_affine):
        acc = curve.g1_add(acc, curve.g1_mul(p, s))
    return acc


def run_msm(scalars_int, points_affine):
    """Convenience host wrapper: ints + affine points -> one affine point."""
    from ..fields.field import BN254_FR

    fr = vecfield.consts(BN254_FR)
    sc = vecfield.from_ints(fr, scalars_int, mont=False)
    pts = g1_vec.points_to_device(points_affine)
    res = msm(sc, pts)
    return g1_vec.points_from_device(tuple(c[None] for c in res))[0]
