"""Multi-scalar multiplication (Pippenger) on TPU.

The capability behind every KZG commitment (halo2's ``commit`` inside
``create_proof``, /root/reference/benches/bench.rs:319-329).

CPU Pippenger scatters points into buckets — a data-dependent access pattern
that is hostile to SIMD. The TPU-native formulation used here:

  1. extract c-bit digits from the scalar limbs for all windows (elementwise)
  2. per window, sort points by digit (XLA sort)                    [parallel]
  3. **log-depth segmented inclusive scan** (Hillis–Steele) over the sorted
     positions with segment id = digit: after ceil(log2 N) rounds, position i
     holds the sum of its bucket's prefix. Every round is ONE vectorized
     complete point-add over all W×N lanes — depth log N instead of N, which
     is what keeps the MXU/VPU busy instead of dispatch-latency-bound.
  4. the last position of each segment is that bucket's total; one scatter
     per window routes them into the (W, B) bucket array.
  5. bucket weighting sum_b b·P_b via suffix sums (log-depth prefix scan on
     the reversed buckets) + a log-depth tree reduction; Horner combine over
     windows with c doublings per step (fixed 256-step tail, N-independent).

Everything is jittable with static N; the level loops are `fori_loop`s with
gather-based shifts, so the compiled graph holds a single point-add body per
loop regardless of N.
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


def _scatter_buckets(buckets, fd, fp):
    """Scatter flushed segment totals into the bucket arrays.

    fd (W, M) digit destinations (NUM_BUCKETS = trash); fp point tuple of
    (W, M, 16). Destinations are unique per window by construction (each
    bucket's segment completes exactly once across the whole tree)."""

    def scatter_one(bk, d, p):
        return tuple(b.at[d].set(c, mode="drop") for b, c in zip(bk, p))

    return jax.vmap(scatter_one, in_axes=(0, 0, 0))(buckets, fd, fp)


def _bucket_sums(digits, points):
    """digits (W, N); points: projective tuple of (N, 16).

    Returns bucket sums as a tuple of (W, NUM_BUCKETS, 16) coords.

    Work-efficient segmented tree-reduce over the digit-sorted points:
    level l merges 2^l-span nodes pairwise (N/2 + N/4 + ... ≈ N point-adds
    total, vs N·log N for a Hillis–Steele scan). Each node tracks its open
    leftmost/rightmost segment sums; a segment becomes interior to a node
    at exactly one merge, where its total is flushed into the bucket array
    by a collision-free scatter."""
    w, n = digits.shape
    order = jnp.argsort(digits, axis=1)  # (W, N)
    ds = jnp.take_along_axis(digits, order, axis=1)
    p_sorted = tuple(c[order] for c in points)  # (W, N, 16)

    buckets = identity((w, NUM_BUCKETS + 1))
    trash = jnp.int32(NUM_BUCKETS)

    # pad to a power of two with sentinel-digit identity points (they form
    # their own segments and flush into the trash slot)
    m = 1 << max(0, (n - 1).bit_length())
    if m > n:
        ds = jnp.concatenate(
            [ds, jnp.full((w, m - n), NUM_BUCKETS, ds.dtype)], axis=1
        )
        ident = identity((w, m - n))
        p_sorted = tuple(
            jnp.concatenate([c, ic], axis=1) for c, ic in zip(p_sorted, ident)
        )

    # leaf nodes: every element is a single-segment node
    dl, dr = ds, ds
    pl = pr = p_sorted
    single = jnp.ones(ds.shape, bool)

    while dl.shape[1] > 1:
        a_dl, b_dl = dl[:, 0::2], dl[:, 1::2]
        a_dr, b_dr = dr[:, 0::2], dr[:, 1::2]
        a_single, b_single = single[:, 0::2], single[:, 1::2]
        a_pl = tuple(c[:, 0::2] for c in pl)
        b_pl = tuple(c[:, 1::2] for c in pl)
        a_pr = tuple(c[:, 0::2] for c in pr)
        b_pr = tuple(c[:, 1::2] for c in pr)

        # effective boundary sums (single nodes carry their total in Pl)
        a_r_eff = point_select(a_single, a_pl, a_pr)
        b_l_eff = b_pl
        join = a_dr == b_dl
        mid = point_add(a_r_eff, b_l_eff)

        # new node state
        n_dl, n_dr = a_dl, b_dr
        n_single = a_single & b_single & join
        n_pl = point_select(a_single & join, mid, a_pl)
        n_pr = point_select(
            b_single & join, mid, point_select(b_single, b_pl, b_pr)
        )

        # flushes (segments that became interior at this merge):
        #  - !join, !a_single: A's rightmost completes -> (a_dr, a_pr_eff)
        #  -  join, !a_single, !b_single: merged middle completes -> (a_dr, mid)
        f1_fire_nojoin = ~join & ~a_single
        f1_fire_join = join & ~a_single & ~b_single
        f1_d = jnp.where(f1_fire_nojoin | f1_fire_join, a_dr, trash)
        f1_p = point_select(join, mid, a_r_eff)
        #  - !join, !b_single: B's leftmost completes -> (b_dl, b_pl)
        f2_d = jnp.where(~join & ~b_single, b_dl, trash)
        buckets = _scatter_buckets(buckets, f1_d, f1_p)
        buckets = _scatter_buckets(buckets, f2_d, b_pl)

        dl, dr, single, pl, pr = n_dl, n_dr, n_single, n_pl, n_pr

    # root: flush the still-open boundary segments
    root_pr_eff = point_select(single, pl, pr)
    buckets = _scatter_buckets(buckets, dl, pl)
    f_d = jnp.where(single, trash, dr)
    buckets = _scatter_buckets(buckets, f_d, root_pr_eff)
    return tuple(b[:, :NUM_BUCKETS] for b in buckets)


def _bucket_reduce(buckets):
    """(W, B, 16) coords -> per-window sums  sum_b b * bucket_b.

    sum_b b·P_b = sum of suffix sums over b>=1; both the suffix prefix-scan
    and the final summation run at log depth over (W, B) lanes.
    """
    w, bcount = buckets[0].shape[:2]
    rev = tuple(c[:, 1:][:, ::-1] for c in buckets)  # (W, B-1), bucket B-1 first
    m = bcount - 1

    # inclusive prefix sum over reversed buckets = suffix sums
    levels = max(1, (m - 1).bit_length())
    iota = jnp.arange(m, dtype=jnp.int32)

    def level(l, acc):
        d = jnp.int32(1) << l
        src = jnp.maximum(iota - d, 0)
        shifted = tuple(jnp.take(c, src, axis=1) for c in acc)
        combined = point_add(acc, shifted)
        return point_select((iota >= d)[None, :], combined, acc)

    suffix = jax.lax.fori_loop(0, levels, level, rev)

    # tree-reduce sum over the suffix sums: pad to a power of two with the
    # identity, then log2 halving rounds (full-width masked adds so the
    # compiled graph holds a single point-add body)
    msize = 1 << max(1, (m - 1).bit_length())
    if msize > m:
        ident = identity((w, msize - m))
        suffix = tuple(
            jnp.concatenate([c, ic], axis=1) for c, ic in zip(suffix, ident)
        )
    iota2 = jnp.arange(msize, dtype=jnp.int32)

    def fold(l, acc):
        half = jnp.int32(msize) >> (l + 1)
        src = jnp.minimum(iota2 + half, msize - 1)
        partner = tuple(jnp.take(c, src, axis=1) for c in acc)
        combined = point_add(acc, partner)
        return point_select((iota2 < half)[None, :], combined, acc)

    acc = jax.lax.fori_loop(0, msize.bit_length() - 1, fold, suffix)
    return tuple(c[:, 0] for c in acc)


def _window_combine(window_sums):
    """(W, 16) coords -> final point: Horner over windows, MSB window first."""
    res = identity(())

    def step(res, x):
        res = jax.lax.fori_loop(0, WINDOW_BITS, lambda _, r: point_double(r), res)
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
