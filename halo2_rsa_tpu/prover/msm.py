"""Multi-scalar multiplication (Pippenger) on TPU.

The capability behind every KZG commitment (halo2's ``commit`` inside
``create_proof``, /root/reference/benches/bench.rs:319-329).

CPU Pippenger scatters points into buckets — a data-dependent access pattern
that is hostile to SIMD. The TPU-native formulation used here:

  per window (vmapped over all windows at once):
    1. extract c-bit digits from the scalar limbs            (elementwise)
    2. sort points by digit                                   (XLA sort)
    3. segmented Hillis–Steele scan with the complete EC add  (log2 N steps,
       every step a full-width vectorized point_add)
    4. scatter the per-segment totals into the bucket array   (one scatter)
  then: batched running-sum over buckets (the classic sum-of-suffix-sums
  trick), and a Horner combine over windows with c doublings per step.

Everything is jittable with static N; digits/sort/scan shard naturally over
points for multi-chip execution (see parallel/).
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


def digits_from_scalar_limbs(scalars):
    """(N, 16) uint32 standard-form Fr limbs -> (NUM_WINDOWS, N) int32 digits."""
    outs = []
    for j in range(NUM_LIMBS):
        limb = scalars[:, j]
        outs.append(limb & 0xFF)
        outs.append(limb >> 8)
    return jnp.stack(outs, axis=0).astype(jnp.int32)


def _segmented_bucket_sums(digits, points, num_buckets):
    """One window: per-digit sums of points.

    digits (N,) int32 sorted ascending is NOT required on input — sorting
    happens here. Returns bucket array tuple of (num_buckets, 16) coords.
    """
    n = digits.shape[0]
    order = jnp.argsort(digits)
    ds = digits[order]
    p = tuple(c[order] for c in points)

    head = jnp.concatenate([jnp.ones((1,), bool), ds[1:] != ds[:-1]])
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(s, carry):
        p, f = carry
        stride = jnp.int32(1) << s
        in_range = pos >= stride
        # predecessor at distance `stride` (roll handles the wrap; the
        # wrapped lanes are masked out via `in_range`)
        prev = tuple(jnp.roll(c, stride, axis=0) for c in p)
        prev_f = jnp.where(in_range, jnp.roll(f, stride, axis=0), True)
        combined = point_add(p, prev)
        take = (~f) & in_range
        p = point_select(take, combined, p)
        f = f | prev_f
        return (p, f)

    p, _ = jax.lax.fori_loop(0, steps, body, (p, head))

    end = jnp.concatenate([ds[1:] != ds[:-1], jnp.ones((1,), bool)])
    # scatter segment totals to their bucket slot; non-ends go to a trash slot
    idx = jnp.where(end, ds, num_buckets)
    buckets = identity((num_buckets + 1,))
    buckets = tuple(b.at[idx].set(c, mode="drop") for b, c in zip(buckets, p))
    return tuple(b[:num_buckets] for b in buckets)


def _bucket_reduce(buckets):
    """(W, B, 16) coords -> per-window sums  sum_b b * bucket_b.

    Running-sum trick, scanned from the top bucket down; batch dim = windows.
    """
    w = buckets[0].shape[0]
    nb = buckets[0].shape[1]
    acc = identity((w,))
    total = identity((w,))
    # scan over buckets b = nb-1 .. 1
    rev = tuple(c[:, 1:][:, ::-1] for c in buckets)  # (W, nb-1, 16)
    xs = tuple(jnp.moveaxis(c, 1, 0) for c in rev)  # (nb-1, W, 16)

    def step(carry, x):
        acc, total = carry
        acc = point_add(acc, x)
        total = point_add(total, acc)
        return (acc, total), None

    (acc, total), _ = jax.lax.scan(step, (acc, total), xs)
    return total


def _window_combine(window_sums):
    """(W, 16) coords -> final point: Horner over windows, MSB window first."""
    w = window_sums[0].shape[0]
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
    buckets = jax.vmap(
        lambda d: _segmented_bucket_sums(d, points, 1 << WINDOW_BITS)
    )(digits)
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
