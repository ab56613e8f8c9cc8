"""Multi-chip MSM: points partitioned across the mesh.

SURVEY.md §2.3 / §7 phase 6: "MSM points/buckets sharded across chips with
collective bucket reduction". Formulation:

* each device runs the single-chip Pippenger bucket pipeline (sort +
  segmented scan + bucket reduce) over its shard of the points — embarrassingly
  parallel over the long dimension;
* per-device *window sums* (32 points per device) are exchanged with one
  all-gather over ICI and combined with log2(D) vectorized point-adds
  (EC addition is the reduction operator, so a psum cannot be used — the
  gather+tree keeps the collective payload at a few KB);
* the final Horner window combine runs replicated.

Implemented with shard_map over a 1-D mesh axis; scales to N chips with
near-linear speedup (per-chip work = N_points/D · adds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import vecfield
from ..utils.xjit import fjit
from ..fields.field import BN254_FR
from ..prover import g1_vec
from ..prover.msm import (
    _bucket_reduce,
    _bucket_sums,
    _pick_chunk,
    _window_bits_for,
    _window_combine,
    digits_from_scalar_limbs,
)
from ..prover.g1_vec import point_add


def make_sharded_msm(mesh: Mesh, axis: str = "rows"):
    """Returns msm(scalars (N,16) std Fr limbs, points proj tuple (N,16)) with
    N divisible by the axis size; executes sharded over ``axis``."""
    d = mesh.shape[axis]

    def per_shard(scalars, points):
        # local bucket pipeline on this shard
        window_bits = _window_bits_for(scalars.shape[0] * d)
        digits = digits_from_scalar_limbs(scalars, window_bits)
        buckets = _bucket_sums(digits, points, 1 << window_bits)
        sums = _bucket_reduce(buckets)  # (W, 16) coords — this shard's windows
        # gather all shards' window sums: (D, W, 16)
        gathered = tuple(
            jax.lax.all_gather(c, axis_name=axis) for c in sums
        )
        # tree-reduce over the device axis with EC adds (log D steps)
        acc = gathered
        size = d
        while size > 1:
            half = size // 2
            lo = tuple(c[:half] for c in acc)
            hi = tuple(c[half : 2 * half] for c in acc)
            merged = point_add(lo, hi)
            if size % 2:
                merged = tuple(
                    jnp.concatenate([m, c[size - 1 : size]], axis=0)
                    for m, c in zip(merged, acc)
                )
                size = half + 1
            else:
                size = half
            acc = merged
        window_sums = tuple(c[:1] for c in acc)  # (1, W, 16)
        out = _window_combine(window_sums, window_bits)  # (1, 16) coords
        return tuple(c[0] for c in out)

    fn = fjit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis), (P(axis), P(axis), P(axis))),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )

    def msm_sharded(scalars, points):
        n = scalars.shape[0]
        pad = -n % d
        if pad:
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((pad, 16), jnp.uint32)], axis=0
            )
            ident = g1_vec.identity((pad,))
            points = tuple(
                jnp.concatenate([c, ic], axis=0) for c, ic in zip(points, ident)
            )
        sharding = NamedSharding(mesh, P(axis))
        scalars = jax.device_put(scalars, NamedSharding(mesh, P(axis, None)))
        points = tuple(
            jax.device_put(c, NamedSharding(mesh, P(axis, None))) for c in points
        )
        return fn(scalars, points)

    return msm_sharded
