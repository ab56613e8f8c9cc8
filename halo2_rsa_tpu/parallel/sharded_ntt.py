"""Distributed NTT over a device mesh (four-step / Bailey factorization).

The reference's polynomial FFTs are single-process rayon loops inside halo2
(`create_proof` column FFTs, /root/reference/benches/bench.rs:319-329). The
TPU-native scaling obligation (SURVEY.md §2.3, §7 phase 6) is an NTT whose
coefficients are sharded across chips with the stage exchange riding ICI.

Factor N = A · B and write k = c + A·d (c < A, d < B), i = a·B + b:

    X[c + A·d] = Σ_b [ ω^{bc} · (Σ_a v[a·B+b] · (ω^B)^{ac}) ] · (ω^A)^{bd}

which is the classic four-step schedule:

  1. length-A NTTs along the *rows* axis — columns b are sharded over the
     mesh, so this stage is fully local (root ω^B = root_of_unity(log_A));
  2. twiddle by ω^{b·c} — elementwise; since b < B and c < A, the exponent
     b·c < N ≤ 2^28 fits an int32 with NO modular reduction, and the factor
     is assembled from two sqrt(N)-entry tables (replicated, ~1 MB);
  3. ONE tiled ``all_to_all`` over the mesh axis — the only communication:
     each device exchanges an equal (A/D, B/D) tile with every peer,
     resharding from column-sharded to row-sharded;
  4. length-B NTTs along the *columns* axis — now local.

The output block on device d holds X[c + A·d'] for its row range; one
transpose+reshape (outside the shard_map, GSPMD-handled) restores natural
order. Inverse: same schedule over ω^{-1}; the two local stages' 1/A and
1/B scales compose to the 1/N of the full inverse transform.

Stages reuse :mod:`..prover.ntt`'s constant-geometry local kernel, so the
compiled graph is O(1) in N and the whole transform is one jitted
shard_map program per (log_n, D) class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # pre-0.8 JAX
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import vecfield
from ..fields.field import BN254_FR
from ..fields.vecfield import _mont_mul
from ..prover import ntt as ntt_mod
from ..prover.ntt import _ntt_graph, root_of_unity

FR = vecfield.consts(BN254_FR)
R_MOD = BN254_FR.p


@functools.lru_cache(maxsize=None)
def _full_twiddle_tables(log_n: int, inverse: bool):
    """Two-level tables covering exponents < N: W^e = hi[e >> h]·lo[e & mask]."""
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, R_MOD)
    h = (log_n + 1) // 2
    lo = [pow(w, j, R_MOD) for j in range(1 << h)]
    hi = [pow(w, j << h, R_MOD) for j in range(1 << (log_n - h))]
    return (
        h,
        vecfield.from_ints_np(FR, lo, mont=True),
        vecfield.from_ints_np(FR, hi, mont=True),
    )


def _split(log_n: int, d: int) -> tuple[int, int]:
    """log_A, log_B with A·B = N and d | A, d | B (both stages shardable)."""
    log_d = max(0, (d - 1).bit_length())
    log_a = log_n // 2
    log_b = log_n - log_a
    assert min(log_a, log_b) >= log_d, (
        f"N=2^{log_n} too small to four-step over {d} devices"
    )
    return log_a, log_b


def _four_step_block(block, log_a: int, log_b: int, inverse: bool,
                     h: int, lo_tab, hi_tab, axis: str):
    """Per-device body: block (A, B/D, 16) -> (A/D, B, 16)."""
    a_len = 1 << log_a
    b_loc = block.shape[1]
    dev = jax.lax.axis_index(axis)

    # 1. length-A NTT down each local column (root ω^B = root_of_unity(log_a));
    # _ntt_graph batches over its leading axis, so put the columns there
    y = jnp.swapaxes(
        _ntt_graph(jnp.swapaxes(block, 0, 1), log_a, inverse), 0, 1
    )

    # 2. twiddle ω^{b·c}: b global column id, c row id; b·c < N fits int32
    b_ids = dev * b_loc + jnp.arange(b_loc, dtype=jnp.int32)  # (B_loc,)
    c_ids = jnp.arange(a_len, dtype=jnp.int32)  # (A,)
    e = c_ids[:, None] * b_ids[None, :]  # (A, B_loc) < N <= 2^28
    tw = _mont_mul(FR, hi_tab[e >> h], lo_tab[e & ((1 << h) - 1)])
    y = _mont_mul(FR, y, tw)

    # 3. the one exchange: reshard rows<->cols (tiled all_to_all over ICI)
    y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1, tiled=True)

    # 4. length-B NTT along each local row (root ω^A), rows batched natively
    return _ntt_graph(y, log_b, inverse)


@functools.lru_cache(maxsize=None)
def _build(mesh: Mesh, axis: str, log_n: int, inverse: bool, batched: bool):
    d = mesh.shape[axis]
    log_a, log_b = _split(log_n, d)
    a_len, b_len = 1 << log_a, 1 << log_b
    h, lo_np, hi_np = _full_twiddle_tables(log_n, inverse)

    def body(block, lo_tab, hi_tab):
        f = lambda blk: _four_step_block(
            blk, log_a, log_b, inverse, h, lo_tab, hi_tab, axis
        )
        return jax.vmap(f)(block) if batched else f(block)

    if batched:
        specs = (P(None, None, axis, None), P(), P())
        out_spec = P(None, axis, None, None)
    else:
        specs = (P(None, axis, None), P(), P())
        out_spec = P(axis, None, None)

    # check_vma=False: the local NTT kernels seed lax.scan carries with
    # fresh zeros (unvarying), which the varying-manual-axes tracker would
    # reject; per-device values genuinely vary, so the check is just off.
    try:
        sm = shard_map(
            body, mesh=mesh, in_specs=specs, out_specs=out_spec, check_vma=False
        )
    except TypeError:  # older JAX spelling
        sm = shard_map(
            body, mesh=mesh, in_specs=specs, out_specs=out_spec, check_rep=False
        )

    @jax.jit
    def run(x):
        # x: (N, 16) or (P, N, 16) Montgomery limbs, natural order
        lead = x.shape[:-2]
        m = x.reshape(lead + (a_len, b_len, 16))
        out = sm(m, jnp.asarray(lo_np), jnp.asarray(hi_np))
        # out[..., c, d', :] = X[c + A·d']  ->  natural order via transpose
        perm = tuple(range(len(lead))) + (
            len(lead) + 1, len(lead), len(lead) + 2
        )
        return jnp.transpose(out, perm).reshape(lead + (1 << log_n, 16))

    return run


def ntt_sharded(x, log_n: int, mesh: Mesh, axis: str = "rows"):
    """Forward NTT of (N, 16) Montgomery limbs, sharded over ``mesh[axis]``.

    Bit-identical to :func:`..prover.ntt.ntt`."""
    return _build(mesh, axis, log_n, False, x.ndim == 3)(x)


def intt_sharded(x, log_n: int, mesh: Mesh, axis: str = "rows"):
    """Inverse NTT (includes the 1/N scale); sharded counterpart of
    :func:`..prover.ntt.intt`."""
    return _build(mesh, axis, log_n, True, x.ndim == 3)(x)
