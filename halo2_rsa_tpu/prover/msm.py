"""Multi-scalar multiplication (Pippenger) on TPU.

The capability behind every KZG commitment (halo2's ``commit`` inside
``create_proof``, /root/reference/benches/bench.rs:319-329).

CPU Pippenger scatters points into buckets — a data-dependent access pattern
that is hostile to SIMD. The TPU-native formulation used here:

  1. extract c-bit digits from the scalar limbs for all windows (elementwise)
  2. per window, sort points by digit (XLA sort)                    [parallel]
  3. **chunked inclusive prefix scan** of the sorted points: split the sorted
     sequence into lanes of C contiguous elements, run a C-step sequential
     scan across all W x N/C lanes at once (one vectorized point-add per
     step), then a log-depth scan over the N/C chunk totals, then one
     offset-add. Work ~2N point-adds (work-optimal), and the whole scan is
     THREE point-add instances in the compiled graph regardless of N —
     no unrolled reduction tree, no compile-time blow-up.
  4. bucket totals by *prefix-sum differencing*: the sum of bucket b's
     segment is scan[end_b] - scan[end_{b-1}] where end_b comes from one
     vectorized searchsorted. (EC subtraction = add the Y-negated point.)
  5. bucket weighting sum_b b*P_b via suffix sums (log-depth prefix scan on
     the reversed buckets) + a log-depth tree reduction; Horner combine over
     windows with c doublings per step (fixed 256-step tail, N-independent).

Every loop is a ``fori_loop``/``scan`` whose body holds a single point-add,
so the compiled graph size is O(1) in N. Window width scales with N
(4-bit windows below ~4k points, 8-bit above), and :func:`msm_many`
commits MANY polynomials against the same base points in one batched
pipeline — the per-call sequential Horner tail is paid once per batch,
not once per commitment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import vecfield
from ..fields.field import NUM_LIMBS
from ..utils.xjit import fjit
from . import curve, g1_vec
from .g1_vec import (
    identity,
    point_add,
    point_add_mixed,
    point_double,
    point_neg,
    point_select,
)

SCALAR_BITS = 256  # Fr scalars < 2^254


def _window_bits_for(n: int) -> int:
    """Pippenger window width: bucket count ~ sqrt-ish of N."""
    return 4 if n <= 4096 else 8


def digits_from_scalar_limbs(scalars, window_bits: int = 8):
    """(..., N, 16) uint32 standard-form Fr limbs -> (..., W, N) int32
    digits, W = 256/window_bits, least-significant window first.

    Vectorized: per-shift slabs + ONE transpose, instead of W strided
    slice-extractions (which XLA materialized as W separate passes —
    ~19 ms/poly at 2^15, measured r4)."""
    per_limb = 16 // window_bits
    mask = (1 << window_bits) - 1
    shifted = [
        (scalars >> (t * window_bits)) & mask for t in range(per_limb)
    ]  # each (..., N, 16)
    d = jnp.stack(shifted, axis=-1)  # (..., N, 16, per_limb)
    d = d.reshape(scalars.shape[:-1] + (NUM_LIMBS * per_limb,))
    return jnp.swapaxes(d, -1, -2).astype(jnp.int32)


def _pick_chunk(n: int) -> int:
    """Sequential chunk length C ~ sqrt(N), capped at 64: C sequential
    launches of one fused point-add vs log2(N/C) FULL-WIDTH extra scan
    levels over the chunk totals. Measured on v5e: C=16 regressed the
    flagship (the scan levels do real work — halving C doubles them);
    C=64 balances launch count against scan width."""
    c = 1 << max(2, (max(n, 2) - 1).bit_length() // 2)
    return min(c, 64)


def _hs_point_scan(ps, axis_len: int):
    """Inclusive EC prefix scan along axis -2 of (..., L, 16) coord tuples.

    Hillis-Steele: log2(L) rounds of one full-width point-add."""
    if axis_len <= 1:
        return ps
    steps = (axis_len - 1).bit_length()
    iota = jnp.arange(axis_len, dtype=jnp.int32)

    def body(s, acc):
        d = jnp.int32(1) << s
        src = jnp.maximum(iota - d, 0)
        shifted = tuple(jnp.take(c, src, axis=-2) for c in acc)
        comb = point_add(acc, shifted)
        return point_select(iota >= d, comb, acc)

    return jax.lax.fori_loop(0, steps, body, ps)


def _bucket_sums(digits, points, num_buckets: int, z_one: bool = False):
    """digits (W, N) int32; points: projective tuple of (N, 16).

    Returns bucket sums as a tuple of (W, num_buckets, 16) coords.
    ``z_one``: all points are affine (Z == one in Montgomery form) — skips
    the W-way gather of the constant Z coordinate (1/3 of the pipeline's
    dominant random-gather volume; the SRS powers satisfy this)."""
    w, n = digits.shape
    order = jnp.argsort(digits, axis=1)  # (W, N)
    ds = jnp.take_along_axis(digits, order, axis=1)
    if z_one:
        # affine base points: gather only (x, y); the scan uses the MIXED
        # add (RCB15 alg 8, complete for affine second operand), saving a
        # mul per add and the whole broadcast-Z coordinate stream
        ps = tuple(c[order] for c in points[:2])
    else:
        ps = tuple(c[order] for c in points)  # (W, N, 16)

    c_len = _pick_chunk(n)
    npad = -(-n // c_len) * c_len
    if npad > n:
        pad = npad - n
        ds = jnp.concatenate([ds, jnp.full((w, pad), num_buckets, ds.dtype)], axis=1)
        if z_one:
            # pad with a REAL affine point (the generator): its digit
            # num_buckets sorts after every live element, so no bucket
            # boundary ever reads a prefix containing it (see gather_pts)
            gen = g1_vec.points_to_device([curve.G1_GEN])
            padp = tuple(
                jnp.broadcast_to(c, (w, pad, 16)) for c in gen[:2]
            )
        else:
            padp = identity((w, pad))
        ps = tuple(jnp.concatenate([c, ic], axis=1) for c, ic in zip(ps, padp))
    n_chunks = npad // c_len
    p3 = tuple(c.reshape(w, n_chunks, c_len, 16) for c in ps)

    # 1) sequential inclusive scan within each length-C chunk (ONE add body)
    acc0 = identity((w, n_chunks))
    within0 = identity((w, n_chunks, c_len))

    def seq_body(j, carry):
        acc, within = carry
        x = tuple(
            jax.lax.dynamic_slice_in_dim(c, j, 1, axis=2)[:, :, 0] for c in p3
        )
        acc = point_add_mixed(acc, x) if z_one else point_add(acc, x)
        within = tuple(
            jax.lax.dynamic_update_slice_in_dim(o, a[:, :, None], j, axis=2)
            for o, a in zip(within, acc)
        )
        return acc, within

    totals, within = jax.lax.fori_loop(0, c_len, seq_body, (acc0, within0))

    # 2) exclusive scan of the chunk totals (log-depth, one add body)
    incl = _hs_point_scan(totals, n_chunks)
    ident1 = identity((w, 1))
    excl = tuple(
        jnp.concatenate([i1, c[:, :-1]], axis=1) for c, i1 in zip(incl, ident1)
    )

    flat_within = tuple(c.reshape(w, npad, 16) for c in within)

    # 3+4) bucket_b = scan[end_b] - scan[end_{b-1}] (difference of prefix
    # sums), where scan[i] = within[i] + chunk_offset[i // C]. The offsets
    # are spliced in ONLY at the ~B bucket boundaries actually read — a
    # (W, B) point-add per gather instead of the former full-width (W, N)
    # add over every element (that add was ~half the pipeline's EC work).
    targets = jnp.arange(num_buckets, dtype=ds.dtype)
    ss = jax.vmap(lambda row: jnp.searchsorted(row, targets, side="right"))(ds)
    ends = ss.astype(jnp.int32) - 1  # (W, B); -1 => empty prefix
    prev = jnp.concatenate(
        [jnp.full((w, 1), -1, jnp.int32), ends[:, :-1]], axis=1
    )

    def gather_pts(idx):
        cl = jnp.maximum(idx, 0)
        wpts = tuple(
            jnp.take_along_axis(c, cl[..., None], axis=1) for c in flat_within
        )
        opts = tuple(
            jnp.take_along_axis(c, (cl // c_len)[..., None], axis=1)
            for c in excl
        )
        pts = point_add(wpts, opts)
        return point_select(idx >= 0, pts, identity((w, num_buckets)))

    e_pts = gather_pts(ends)
    p_pts = gather_pts(prev)
    return point_add(e_pts, point_neg(p_pts))


def _bucket_reduce(buckets):
    """(W, B, 16) coords -> per-window sums  sum_b b * bucket_b.

    sum_b b*P_b = sum of suffix sums over b>=1; both the suffix prefix-scan
    and the final summation run at log depth over (W, B) lanes.
    """
    w, bcount = buckets[0].shape[:2]
    rev = tuple(c[:, 1:][:, ::-1] for c in buckets)  # (W, B-1), bucket B-1 first
    m = bcount - 1

    suffix = _hs_point_scan(rev, m)

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


def _window_combine(window_sums, window_bits: int):
    """(P, W, 16) coords -> per-poly points (P, 16): Horner over windows,
    MSB window first, the P axis batched through every add/double."""
    p = window_sums[0].shape[0]
    res = identity((p,))

    def step(res, x):
        res = jax.lax.fori_loop(
            0, window_bits, lambda _, r: point_double(r), res
        )
        return point_add(res, x), None

    # (P, W, 16) -> (W, P, 16), top window first
    xs = tuple(jnp.moveaxis(c[:, ::-1], 1, 0) for c in window_sums)
    res, _ = jax.lax.scan(step, res, xs)
    return res


def _msm_one(sc, points, window_bits: int):
    """sc (N, 16); points tuple of (N, 16). Returns a coord tuple of (16,)."""
    out = _msm_chunk(sc[None], points, window_bits)
    return tuple(c[0] for c in out)


def _msm_chunk_sums(sc, points, window_bits: int, z_one: bool = False):
    """Per-window sums for a chunk of the poly axis WITHOUT vmap: the poly
    axis is folded into the Pippenger window axis, so every stage (sort,
    chunked scans, bucket differencing, reduction) runs one explicitly-
    batched pipeline of shape (PC*W, ...). Explicit batching keeps the
    fused Pallas field kernels on their primary (non-vmapped) path and
    compiles one graph per (PC, N, wb) size class.

    sc (PC, N, 16); points shared tuple of (N, 16). Returns (PC, W, 16)
    coords (window sums — Horner-combined separately, so point-axis
    SEGMENTS of a large MSM can accumulate window sums first)."""
    pc = sc.shape[0]
    num_buckets = 1 << window_bits
    digits = digits_from_scalar_limbs(sc, window_bits)  # (PC, W, N)
    w = digits.shape[1]
    flat = digits.reshape(pc * w, digits.shape[2])
    buckets = _bucket_sums(flat, points, num_buckets, z_one)  # (PC*W, B)
    sums = _bucket_reduce(buckets)  # (PC*W, 16)
    return tuple(c.reshape(pc, w, 16) for c in sums)


def _msm_chunk(sc, points, window_bits: int, z_one: bool = False):
    """sc (PC, N, 16); points shared tuple of (N, 16) -> (PC, 16) coords."""
    return _window_combine(
        _msm_chunk_sums(sc, points, window_bits, z_one), window_bits
    )


@functools.partial(fjit, static_argnums=(2,))
def _msm_one_jit(sc, points, window_bits: int):
    return _msm_one(sc, points, window_bits)


@functools.partial(fjit, static_argnums=(2, 3))
def _msm_chunk_jit(sc, points, window_bits: int, z_one: bool = False):
    return _msm_chunk(sc, points, window_bits, z_one)


@functools.partial(fjit, static_argnums=(2, 3))
def _msm_chunk_sums_jit(sc, points, window_bits: int, z_one: bool = False):
    return _msm_chunk_sums(sc, points, window_bits, z_one)


@functools.partial(fjit, static_argnums=(2,))
def _msm_small_stacked_jit(sc, points, window_bits: int):
    """Window sums for one small MSM, returned as ONE stacked (3, W, 16)
    array so the host reads everything back in a single transfer."""
    sums = _msm_chunk_sums(sc[None], points, window_bits)
    return jnp.stack([c[0] for c in sums])


@functools.partial(fjit, static_argnums=(1,))
def _window_combine_jit(window_sums, window_bits: int):
    return _window_combine(window_sums, window_bits)


@fjit
def _point_add_jit(p1, p2):
    return point_add(p1, p2)


# Point-axis segment size for large MSMs: the bucket pipeline gathers
# ~3·W·Nseg coordinate rows (1.6 GB at 2^15, W=32); N=2^18 unsegmented
# needs ~13 GB and OOMs a 16 GB chip alongside the proving key.
_SEG = 1 << 15


def _pick_pchunk(n: int) -> int:
    """Polys per device dispatch: bound peak memory (the bucket pipeline
    materializes ~W*N*3 coords per poly, ~200 MB at N=2^15) while
    amortizing dispatches. pc=8 at 2^15 measured SLOWER than 4 on v5e
    (working set leaves the sweet spot) — keep 4."""
    if n <= 4096:
        return 8
    if n <= 1 << 15:
        return 4
    return 2


def _chunk_plan(p: int, pc_max: int) -> list:
    """Split the poly axis into chunk sizes from {pc_max, pc_max/2, ..., 1}
    with no padding waste (a p=2 call used to pad to the pc=4 class and do
    2x the bucket work)."""
    sizes = []
    size = pc_max
    rem = p
    while rem:
        while size > rem:
            size //= 2
        sizes.append(size)
        rem -= size
    return sizes


def msm_many(scalars, points, z_one: bool = False):
    """Batched MSM: commit P scalar vectors against shared points.

    scalars (P, N, 16) uint32 standard-form Fr limbs; points: projective
    tuple of (N, 16) Montgomery Fq coords. Returns a projective tuple of
    (P, 16) coords. N is padded to the next power of two (>= 32); the poly
    axis is split into power-of-two chunk classes (no zero-poly padding)
    and every chunk's window sums share ONE final Horner combine (the
    256-step sequential tail is paid once per call, not once per chunk).

    ``z_one``: promise that every base point has Z == 1 (affine, e.g. the
    SRS powers) — skips gathering the constant Z coordinate in the bucket
    pipeline. Any point-axis padding then uses the generator (a valid
    curve point) — harmless because its scalars are 0 and digit-0 points
    never enter a bucket."""
    p, n = scalars.shape[:2]
    npow = max(32, 1 << max(0, (n - 1).bit_length()))
    if npow > n:
        pad = npow - n
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((p, pad, 16), jnp.uint32)], axis=1
        )
        if z_one:
            gen = g1_vec.points_to_device([curve.G1_GEN])
            padp = tuple(jnp.broadcast_to(c, (pad, 16)) for c in gen)
        else:
            padp = identity((pad,))
        points = tuple(
            jnp.concatenate([c, ic], axis=0) for c, ic in zip(points, padp)
        )
    if npow > _SEG:
        # point-axis segmentation: each 2^15 segment runs the standard
        # pipeline (reusing its compiled size class), window sums
        # accumulate with one batched EC add per segment, one Horner at
        # the end — work-optimal and memory-bounded
        wb = _window_bits_for(_SEG)
        # half the usual poly chunk: segmented MSMs run beside a large
        # resident proving key (the reason they're segmented at all)
        pc = max(1, _pick_pchunk(_SEG) // 2)
        all_sums = []
        i = 0
        for size in _chunk_plan(p, pc):
            sc = scalars[i : i + size]
            i += size
            sums = None
            for s in range(0, npow, _SEG):
                pts_seg = tuple(c[s : s + _SEG] for c in points)
                seg = _msm_chunk_sums_jit(sc[:, s : s + _SEG], pts_seg, wb, z_one)
                sums = seg if sums is None else _point_add_jit(sums, seg)
            all_sums.append(sums)
    else:
        wb = _window_bits_for(npow)
        pc = _pick_pchunk(npow)
        all_sums = []
        i = 0
        for size in _chunk_plan(p, pc):
            sc = scalars[i : i + size]
            i += size
            all_sums.append(_msm_chunk_sums_jit(sc, points, wb, z_one))
    stacked = tuple(
        jnp.concatenate([ch[c] for ch in all_sums], axis=0) for c in range(3)
    )
    return _window_combine_jit(stacked, wb)


def msm(scalars, points, z_one: bool = False):
    """Single MSM; see :func:`msm_many`. Returns a projective point
    (scalar-shaped coord tuple)."""
    res = msm_many(scalars[None], points, z_one)
    return tuple(c[0] for c in res)


def msm_many_host(scalars, points):
    """msm_many + conversion to host affine points (list of P)."""
    res = msm_many(scalars, points)
    return g1_vec.points_from_device(res)


def msm_host(scalars_int, points_affine):
    """Host reference (slow): sum of s_i * P_i with Python ints."""
    acc = None
    for s, p in zip(scalars_int, points_affine):
        acc = curve.g1_add(acc, curve.g1_mul(p, s))
    return acc


def run_msm_async(scalars_int, points_affine):
    """Dispatch one host-int MSM to the device, return a finish() closure.

    Small inputs (the verifier's ~50-commitment GWC fold) take a fully
    fused single-graph path (digits -> buckets -> reduce in ONE jit call)
    whose dominant cost is host<->device round trips (~25 ms each here),
    not FLOPs. The dispatch is async, so the caller can overlap host work
    (e.g. the verifier's Miller loop) with the device compute; finish()
    blocks on ONE stacked readback and Horner-combines the ~32 window sums
    in host big-int math (~8 ms — the device's sequential ~250-step tail
    at this size is latency-bound and slower)."""
    from ..fields.field import BN254_FR

    fr = vecfield.consts(BN254_FR)
    sc = vecfield.from_ints(fr, scalars_int, mont=False)
    pts = g1_vec.points_to_device(points_affine)
    n = sc.shape[0]
    npow = max(32, 1 << max(0, (n - 1).bit_length()))
    if npow <= 512:
        if npow > n:
            sc = jnp.concatenate(
                [sc, jnp.zeros((npow - n, 16), jnp.uint32)], axis=0
            )
            padp = identity((npow - n,))
            pts = tuple(
                jnp.concatenate([c, ic], axis=0) for c, ic in zip(pts, padp)
            )
        wb = _window_bits_for(npow)
        stacked = _msm_small_stacked_jit(sc, pts, wb)

        def finish():
            wpts = g1_vec.points_from_host_stack(np.asarray(stacked))
            acc = None
            for p in reversed(wpts):
                if acc is not None:
                    for _ in range(wb):
                        acc = curve.g1_add(acc, acc)
                acc = curve.g1_add(acc, p)
            return acc

        return finish
    res = msm(sc, pts)
    return lambda: g1_vec.points_from_device(tuple(c[None] for c in res))[0]


def run_msm(scalars_int, points_affine):
    """Convenience host wrapper: ints + affine points -> one affine point."""
    return run_msm_async(scalars_int, points_affine)()
