"""Mesh-sharded kernel provider for the PLONK prover.

SURVEY.md §2.3 / §7 phase 6 obligates the distributed kernels to live *in
the proving pipeline* (the reference's analog is rayon-parallel FFT/MSM
inside ``create_proof``, /root/reference/benches/bench.rs:319-329), not as
an annex. :class:`MeshKernels` implements the prover's kernel-provider
interface (``plonk.LocalKernels``) with the collective formulations:

* **column iNTTs / coset NTTs** — the four-step factorization of
  :mod:`.sharded_ntt`: local stage, twiddle, ONE tiled ``all_to_all`` over
  the mesh axis, local stage. Bit-identical to the single-device transform.
* **commitment / opening MSMs** — points partitioned across devices; each
  device runs the single-chip Pippenger bucket pipeline on its shard, the
  per-device window sums are all-gathered (a few KB) and combined with
  log2(D) vectorized EC adds. The device shards double as the point-axis
  memory segmentation the single-chip path needs at 2^18 points.
* **quotient identities** — ``plonk._quotient_ident_ext`` is elementwise
  over the extended-domain axis, so it runs under one jit on row-sharded
  inputs and GSPMD partitions it with zero communication.

Proof bytes are identical to the single-device path (exact field
arithmetic, same algorithm order, same transcript) — verified by
``tests/test_mesh_prove.py`` on the virtual 8-device CPU mesh.

Shapes too small to four-step over D devices fall back to the local
kernels (a 2^k-row circuit needs k >= 2*ceil(log2 D)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import vecfield
from ..fields.field import BN254_FR
from ..fields.vecfield import mont_mul as _vmul
from ..prover import msm as msm_mod, ntt as ntt_mod, plonk
from ..prover.g1_vec import identity, point_add
from ..utils.xjit import fjit
from .sharded_msm import make_sharded_msm  # noqa: F401  (sibling capability)
from .sharded_ntt import intt_sharded, ntt_sharded

try:
    from jax import shard_map
except ImportError:  # pre-0.8 JAX
    from jax.experimental.shard_map import shard_map

FR = vecfield.consts(BN254_FR)


def _tree_reduce_dev_axis(acc, d: int):
    """EC tree reduction over a leading device axis: tuple of (D, ..., 16)
    coords -> (..., 16). log2(D) full-width vectorized point-adds."""
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
    return tuple(c[0] for c in acc)


@functools.lru_cache(maxsize=None)
def _build_msm_shard(mesh: Mesh, axis: str, window_bits: int,
                     z_one: bool = False):
    """jit(shard_map): (PC, N, 16) scalars x (N, 16) points -> replicated
    (PC, W, 16) window sums, points partitioned over ``axis``."""
    d = mesh.shape[axis]

    def per_shard(sc, px, py, pz):
        sums = msm_mod._msm_chunk_sums(sc, (px, py, pz), window_bits, z_one)
        gathered = tuple(
            jax.lax.all_gather(c, axis_name=axis) for c in sums
        )  # (D, PC, W, 16)
        return _tree_reduce_dev_axis(gathered, d)

    sm = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),
            P(axis, None),
            P(axis, None),
            P(axis, None),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fjit(sm)


class MeshKernels:
    """Sharded kernel provider for ``plonk.prove(..., mesh=...)``."""

    def __init__(self, mesh: Mesh, axis: str = "rows"):
        assert axis in mesh.shape, f"mesh has no '{axis}' axis"
        self.mesh = mesh
        self.axis = axis
        self.d = mesh.shape[axis]
        self._log_d = max(0, (self.d - 1).bit_length())
        self._pts_cache: dict = {}

    # -- NTT ---------------------------------------------------------------

    def _can_shard_ntt(self, log_n: int) -> bool:
        return log_n >= 2 * max(1, self._log_d)

    def intt_batch(self, vals, k: int):
        if not self._can_shard_ntt(k):
            return ntt_mod.intt_batch(vals, k)
        return intt_sharded(vals, k, self.mesh, self.axis)

    # -- MSM ---------------------------------------------------------------

    def _sharded_points(self, points):
        """Row-shard the base points once per (id, length) — the SRS slices
        reappear every round."""
        key = (id(points[0]), points[0].shape[0])
        hit = self._pts_cache.get(key)
        if hit is not None:
            return hit
        spec = NamedSharding(self.mesh, P(self.axis, None))
        out = tuple(jax.device_put(c, spec) for c in points)
        self._pts_cache[key] = out
        return out

    def msm_many(self, scalars, points, z_one: bool = False):
        p, n = scalars.shape[:2]
        d = self.d
        if n < 2 * d:  # trivial sizes: not worth a collective
            return msm_mod.msm_many(scalars, points, z_one)
        npad = -(-n // d) * d
        if npad > n:
            pad = npad - n
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((p, pad, 16), jnp.uint32)], axis=1
            )
            if z_one:
                from ..prover import curve
                from ..prover.g1_vec import points_to_device

                gen = points_to_device([curve.G1_GEN])
                padp = tuple(jnp.broadcast_to(c, (pad, 16)) for c in gen)
            else:
                padp = identity((pad,))
            points = tuple(
                jnp.concatenate([c, ic], axis=0) for c, ic in zip(points, padp)
            )
        # per-device shard plays the role of the single-chip point-axis
        # segment: window width chosen for the global size, capped at the
        # memory-bounded segment class
        wb = msm_mod._window_bits_for(min(npad, msm_mod._SEG))
        nloc = npad // d
        pc = max(1, msm_mod._pick_pchunk(min(nloc, msm_mod._SEG)) // 2)
        fn = _build_msm_shard(self.mesh, self.axis, wb, z_one)
        pts_sh = self._sharded_points(points)
        sc_spec = NamedSharding(self.mesh, P(None, self.axis, None))
        all_sums = []
        i = 0
        for size in msm_mod._chunk_plan(p, pc):
            sc = scalars[i : i + size]
            i += size
            all_sums.append(fn(jax.device_put(sc, sc_spec), *pts_sh))
        stacked = tuple(
            jnp.concatenate([ch[c] for ch in all_sums], axis=0)
            for c in range(3)
        )
        return msm_mod._window_combine_jit(stacked, wb)

    # -- round 3 (quotient) ------------------------------------------------

    def round3_t(self, pk, num_tables: int, wire_polys, m_polys, a_polys,
                 z_poly, h_polys, pi_poly, table_ext, coset_scale,
                 omega_scale, cinv_scale, alpha_pows, beta_m, gamma_m,
                 beta_lk_m, kw_beta):
        log_ext = pk.log_ext
        num_wires = pk.vk.num_wires
        if not self._can_shard_ntt(log_ext):
            return plonk.LocalKernels.round3_t(
                plonk._LOCAL_KERNELS, pk, num_tables, wire_polys, m_polys,
                a_polys, z_poly, h_polys, pi_poly, table_ext, coset_scale,
                omega_scale, cinv_scale, alpha_pows, beta_m, gamma_m,
                beta_lk_m, kw_beta,
            )
        big = _stack_scale_pad(
            num_tables, log_ext, wire_polys, m_polys, a_polys, z_poly,
            h_polys, pi_poly, omega_scale, coset_scale,
        )
        big_ext = ntt_sharded(big, log_ext, self.mesh, self.axis)
        t_ext = _ident_jit(
            num_wires, num_tables, big_ext, pk.fixed_ext, pk.sigma_ext,
            table_ext, pk.l0_ext, pk.x_ext, pk.van_inv, alpha_pows,
            beta_m, gamma_m, beta_lk_m, kw_beta,
        )
        t_coeffs = intt_sharded(t_ext, log_ext, self.mesh, self.axis)
        return _scale_jit(t_coeffs, cinv_scale)


@functools.partial(fjit, static_argnums=(0, 1))
def _stack_scale_pad(num_tables: int, log_ext: int, wire_polys, m_polys,
                     a_polys, z_poly, h_polys, pi_poly, omega_scale,
                     coset_scale):
    """Round-3 poly stack, coset-scaled and zero-padded to the extended
    domain (the pre-NTT half of ``plonk._coset_eval_graph``)."""
    big = plonk._round3_stack(
        num_tables, wire_polys, m_polys, a_polys, z_poly, h_polys, pi_poly,
        omega_scale,
    )
    p, l, _ = big.shape
    scaled = _vmul(FR, big, coset_scale[None])
    return jnp.concatenate(
        [scaled, jnp.zeros((p, (1 << log_ext) - l, 16), jnp.uint32)], axis=1
    )


@functools.partial(fjit, static_argnums=(0, 1))
def _ident_jit(num_wires: int, num_tables: int, big_ext, fixed_ext,
               sigma_ext, table_ext, l0_ext, x_ext, van_inv, alpha_pows,
               beta_m, gamma_m, beta_lk_m, kw_beta):
    return plonk._quotient_ident_ext(
        num_wires, num_tables, big_ext, fixed_ext, sigma_ext, table_ext,
        l0_ext, x_ext, van_inv, alpha_pows, beta_m, gamma_m, beta_lk_m,
        kw_beta,
    )


@fjit
def _scale_jit(coeffs, scale):
    return _vmul(FR, coeffs, scale)
