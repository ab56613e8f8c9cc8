"""Batched witness generation: compile one synthesis into a vectorized
replay program (BASELINE.json config #1 — "witness gen for thousands of
mul_mod instances vectorized").

The reference (and halo2 generally) re-runs gadget synthesis per instance —
cell-at-a-time host code. Here synthesis happens once; every cell records
*provenance* (builder.prov), and this module compiles the provenance DAG into:

* a handful of host-evaluated big-integer macro-ops per instance (the q/r
  witnessing divmods of mul_mod — microseconds of Python each), and
* a levelized, fully vectorized device program for all scalar cells: each
  level executes one gather + batched field op over every instance at once.

Field values are carried in *standard* (non-Montgomery) limb form so that
shift/mask provenance is plain bit arithmetic; products re-enter Montgomery
form transiently (two mont_muls).

Inverse-witness cells (is_zero hints) are dataflow leaves, so they are all
batched into a single Fermat inversion at the end.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.builder import Builder
from ..fields import vecfield
from ..fields.field import NUM_LIMBS
from ..fields.vecfield import FieldConsts


@dataclasses.dataclass
class _Group:
    kind: str
    dst: np.ndarray  # (G,) int32 cell indices
    srcs: list  # list of (G,) int32 arrays
    consts: list  # list of (G,16) uint32 arrays (op-specific)
    meta: list  # op-specific int arrays


class WitnessProgram:
    def __init__(self, builder: Builder):
        self.field = builder.field
        self.fc = vecfield.consts(builder.field)
        self.num_cells = builder.num_witness
        self.prov = list(builder.prov)
        self.bigops = list(builder.bigops)
        self.input_idx = [i for i, p in enumerate(self.prov) if p and p[0] == "in"]
        opaque = [i for i, p in enumerate(self.prov) if p is None]
        if opaque:
            raise ValueError(
                f"{len(opaque)} cells lack provenance (first: {opaque[:5]}); "
                "this circuit cannot be replayed"
            )
        self._big_cells = [
            i for i, p in enumerate(self.prov) if p[0] in ("bigq", "bigr", "bigsub")
        ]
        self._compile()

    # ------------------------------------------------------------------
    # compilation: levelize + group
    # ------------------------------------------------------------------

    _DEPS = {
        "in": (),
        "const": (),
        "bigq": (),
        "bigr": (),
        "bigsub": (),
        "lin": (1, 2),
        "linc": (1, 2, 3, 4),
        "full": (1, 2),
        "mul2": (1, 2, 3, 4),
        "mul3": (1, 2, 3),
        "sel": (1, 2, 3),
        "inv0": (1,),
        "eqz": (1,),
        "shrmask": (1,),
    }

    def _compile(self):
        prov = self.prov
        n = self.num_cells
        level = np.zeros(n, np.int64)
        for i, p in enumerate(prov):
            kind = p[0]
            if kind == "inv0":
                level[i] = -1  # deferred to the final batch inversion
                continue
            deps = [p[d] for d in self._DEPS[kind]]
            if deps:
                level[i] = 1 + max(level[d] for d in deps)
        max_level = int(level.max())

        # constants (static witness entries, same for every instance)
        const_idx = []
        const_vals = []
        inputs_set = set(self.input_idx)
        for i, p in enumerate(prov):
            if p[0] == "const":
                const_idx.append(i)
                const_vals.append(p[1])
        self.const_idx = np.asarray(const_idx, np.int32)
        self.const_limbs = vecfield.from_ints_np(self.fc, const_vals, mont=False)

        # group non-leaf ops by (level, kind); inv0 in one terminal group
        buckets: dict[tuple, list] = {}
        for i, p in enumerate(prov):
            kind = p[0]
            if kind in ("in", "const", "bigq", "bigr", "bigsub"):
                continue
            key = (int(level[i]) if kind != "inv0" else max_level + 1, kind)
            buckets.setdefault(key, []).append(i)

        groups = []
        for (lv, kind), cells in sorted(buckets.items()):
            dst = np.asarray(cells, np.int32)
            ps = [prov[i] for i in cells]
            if kind == "lin":
                srcs = [np.asarray([p[1] for p in ps], np.int32),
                        np.asarray([p[2] for p in ps], np.int32)]
                k0 = vecfield.from_ints_np(self.fc, [p[3] for p in ps], mont=False)
                k1 = vecfield.from_ints_np(self.fc, [p[4] % self.field.p for p in ps], mont=True)
                k2 = vecfield.from_ints_np(self.fc, [p[5] % self.field.p for p in ps], mont=True)
                groups.append(_Group(kind, dst, srcs, [k0, k1, k2], []))
            elif kind == "linc":
                srcs = [np.asarray([p[j] for p in ps], np.int32) for j in (1, 2, 3, 4)]
                ks = [vecfield.from_ints_np(self.fc, [p[5] for p in ps], mont=False)]
                for j in (6, 7, 8, 9):
                    ks.append(
                        vecfield.from_ints_np(
                            self.fc, [p[j] % self.field.p for p in ps], mont=True
                        )
                    )
                groups.append(_Group(kind, dst, srcs, ks, []))
            elif kind == "mul2":
                srcs = [np.asarray([p[j] for p in ps], np.int32) for j in (1, 2, 3, 4)]
                groups.append(_Group(kind, dst, srcs, [], []))
            elif kind == "full":
                srcs = [np.asarray([p[1] for p in ps], np.int32),
                        np.asarray([p[2] for p in ps], np.int32)]
                k0 = vecfield.from_ints_np(self.fc, [p[3] for p in ps], mont=False)
                k1 = vecfield.from_ints_np(self.fc, [p[4] % self.field.p for p in ps], mont=True)
                k2 = vecfield.from_ints_np(self.fc, [p[5] % self.field.p for p in ps], mont=True)
                # k3 stored as k3*R^2 so (a.b)R^{-1} * k3R^2 * R^{-1} = k3 a b
                k3r2 = [
                    (p[6] * self.fc.field.r2) % self.field.p for p in ps
                ]
                k3 = vecfield.from_ints_np(self.fc, k3r2, mont=False)
                groups.append(_Group(kind, dst, srcs, [k0, k1, k2, k3], []))
            elif kind == "mul3":
                srcs = [np.asarray([p[j] for p in ps], np.int32) for j in (1, 2, 3)]
                groups.append(_Group(kind, dst, srcs, [], []))
            elif kind == "sel":
                srcs = [np.asarray([p[j] for p in ps], np.int32) for j in (1, 2, 3)]
                groups.append(_Group(kind, dst, srcs, [], []))
            elif kind == "eqz":
                srcs = [np.asarray([p[1] for p in ps], np.int32)]
                groups.append(_Group(kind, dst, srcs, [], []))
            elif kind == "inv0":
                srcs = [np.asarray([p[1] for p in ps], np.int32)]
                groups.append(_Group(kind, dst, srcs, [], []))
            elif kind == "shrmask":
                srcs = [np.asarray([p[1] for p in ps], np.int32)]
                shift = np.asarray([p[2] for p in ps], np.int32)
                mask = np.asarray([p[3] for p in ps], np.int32)  # 0 = none
                groups.append(_Group(kind, dst, srcs, [], [shift, mask]))
            else:  # pragma: no cover
                raise AssertionError(kind)
        self.groups = groups

    # ------------------------------------------------------------------
    # host: big-op evaluation per instance
    # ------------------------------------------------------------------

    def _host_cell_val(self, i, memo, inputs, bigvals):
        stack = [i]
        prov = self.prov
        p_mod = self.field.p
        while stack:
            j = stack[-1]
            if j in memo:
                stack.pop()
                continue
            p = prov[j]
            kind = p[0]
            if kind == "in":
                memo[j] = inputs[j]
                stack.pop()
                continue
            if kind == "const":
                memo[j] = p[1]
                stack.pop()
                continue
            if kind in ("bigq", "bigr", "bigsub"):
                memo[j] = bigvals[j]
                stack.pop()
                continue
            deps = [p[d] for d in self._DEPS[kind]]
            missing = [d for d in deps if d not in memo]
            if missing:
                stack.extend(missing)
                continue
            vals = [memo[d] for d in deps]
            if kind == "lin":
                memo[j] = (p[3] + p[4] * vals[0] + p[5] * vals[1]) % p_mod
            elif kind == "linc":
                memo[j] = (
                    p[5] + p[6] * vals[0] + p[7] * vals[1] + p[8] * vals[2]
                    + p[9] * vals[3]
                ) % p_mod
            elif kind == "mul2":
                memo[j] = (vals[0] * vals[1] + vals[2] * vals[3]) % p_mod
            elif kind == "full":
                memo[j] = (
                    p[3] + p[4] * vals[0] + p[5] * vals[1] + p[6] * vals[0] * vals[1]
                ) % p_mod
            elif kind == "mul3":
                memo[j] = (vals[0] * vals[1] + vals[2]) % p_mod
            elif kind == "sel":
                memo[j] = vals[1] if vals[0] == 1 else vals[2]
            elif kind == "inv0":
                memo[j] = pow(vals[0], -1, p_mod) if vals[0] else 0
            elif kind == "eqz":
                memo[j] = 1 if vals[0] == 0 else 0
            elif kind == "shrmask":
                v = vals[0] >> p[2]
                if p[3]:
                    v &= (1 << p[3]) - 1
                memo[j] = v
            else:  # pragma: no cover
                raise AssertionError(kind)
            stack.pop()
        return memo[i]

    def _host_bigops(self, inputs: dict) -> dict:
        """Evaluate all big macro-ops for one instance.

        Returns {cell_idx: value} for every big-output cell."""
        memo: dict[int, int] = {}
        bigvals: dict[int, int] = {}
        results: list[tuple] = [None] * len(self.bigops)

        # big-output cells grouped by op
        out_cells: dict[int, list] = {}
        for i in self._big_cells:
            p = self.prov[i]
            out_cells.setdefault(p[1], []).append((i, p))

        def compose(cells, w):
            x = 0
            for c in reversed(cells):
                x = (x << w) | self._host_cell_val(c, memo, inputs, bigvals)
            return x

        for op_id, op in enumerate(self.bigops):
            if op[0] == "divmod":
                _, a_cells, b_cells, n_cells, w = op
                a = compose(a_cells, w)
                b = compose(b_cells, w) if b_cells is not None else 1
                nv = compose(n_cells, w)
                q, r = divmod(a * b, nv)
                results[op_id] = ("divmod", q, r, w)
            elif op[0] == "sub":
                _, a_cells, b_cells, w = op
                a = compose(a_cells, w)
                b = compose(b_cells, w)
                assert a >= b
                results[op_id] = ("sub", a - b, None, w)
            else:  # pragma: no cover
                raise AssertionError(op)
            # fill this op's output cells so later ops can consume them
            for i, p in out_cells.get(op_id, []):
                kind, _, j = p
                _, q, r, w = results[op_id]
                if kind == "bigq":
                    v = (q >> (w * j)) & ((1 << w) - 1)
                elif kind == "bigr":
                    v = (r >> (w * j)) & ((1 << w) - 1)
                else:  # bigsub
                    v = (q >> (w * j)) & ((1 << w) - 1)
                bigvals[i] = v
        return bigvals

    # ------------------------------------------------------------------
    # device replay
    # ------------------------------------------------------------------

    def _device_program(self):
        fc = self.fc
        groups = self.groups
        const_idx = jnp.asarray(self.const_idx)
        const_limbs = jnp.asarray(self.const_limbs)
        input_idx = jnp.asarray(np.asarray(self.input_idx, np.int32))
        big_idx = jnp.asarray(np.asarray(self._big_cells, np.int32))
        num_cells = self.num_cells

        gj = []
        for g in groups:
            gj.append(
                (
                    g.kind,
                    jnp.asarray(g.dst),
                    [jnp.asarray(s) for s in g.srcs],
                    [jnp.asarray(c) for c in g.consts],
                    [jnp.asarray(m) for m in g.meta],
                )
            )

        r2 = jnp.asarray(fc.r2_limbs)[None]

        def mulmod_std(a, b):
            # standard-form product: ((a*b)R^-1) * R^2 * R^-1
            return vecfield._mont_mul(fc, vecfield._mont_mul(fc, a, b), r2)

        def run(inputs, bigvals):
            # inputs (B, n_in, 16); bigvals (B, n_big, 16) — standard form
            batch = inputs.shape[0]
            w = jnp.zeros((batch, num_cells, NUM_LIMBS), jnp.uint32)
            w = w.at[:, const_idx].set(jnp.broadcast_to(const_limbs, (batch,) + const_limbs.shape))
            w = w.at[:, input_idx].set(inputs)
            if big_idx.shape[0]:
                w = w.at[:, big_idx].set(bigvals)
            for kind, dst, srcs, consts, meta in gj:
                if kind == "lin":
                    a = w[:, srcs[0]]
                    b = w[:, srcs[1]]
                    k0, k1, k2 = consts
                    v = vecfield._add(
                        fc,
                        jnp.broadcast_to(k0, a.shape),
                        vecfield._add(
                            fc,
                            vecfield._mont_mul(fc, k1, a),
                            vecfield._mont_mul(fc, k2, b),
                        ),
                    )
                elif kind == "full":
                    a = w[:, srcs[0]]
                    b = w[:, srcs[1]]
                    k0, k1, k2, k3 = consts
                    ab = vecfield._mont_mul(fc, a, b)  # abR^-1
                    v = vecfield._add(
                        fc,
                        jnp.broadcast_to(k0, a.shape),
                        vecfield._add(
                            fc,
                            vecfield._add(
                                fc,
                                vecfield._mont_mul(fc, k1, a),
                                vecfield._mont_mul(fc, k2, b),
                            ),
                            vecfield._mont_mul(fc, ab, k3),
                        ),
                    )
                elif kind == "linc":
                    k0, k1, k2, k3, k4 = consts
                    v = jnp.broadcast_to(k0, w[:, srcs[0]].shape)
                    for km, s in zip((k1, k2, k3, k4), srcs):
                        v = vecfield._add(fc, v, vecfield._mont_mul(fc, km, w[:, s]))
                elif kind == "mul2":
                    v = vecfield._add(
                        fc,
                        mulmod_std(w[:, srcs[0]], w[:, srcs[1]]),
                        mulmod_std(w[:, srcs[2]], w[:, srcs[3]]),
                    )
                elif kind == "mul3":
                    v = vecfield._add(
                        fc, mulmod_std(w[:, srcs[0]], w[:, srcs[1]]), w[:, srcs[2]]
                    )
                elif kind == "sel":
                    c = w[:, srcs[0]]
                    cond = ~vecfield.is_zero(c)
                    v = jnp.where(cond[..., None], w[:, srcs[1]], w[:, srcs[2]])
                elif kind == "eqz":
                    z = vecfield.is_zero(w[:, srcs[0]])
                    one = jnp.zeros((1, 1, NUM_LIMBS), jnp.uint32).at[..., 0].set(1)
                    v = jnp.where(z[..., None], one, jnp.uint32(0))
                elif kind == "inv0":
                    a = w[:, srcs[0]]
                    a_m = vecfield._mont_mul(fc, a, jnp.broadcast_to(r2, a.shape))
                    inv_m = vecfield._pow_bits(fc, a_m, jnp.asarray(fc.p_minus_2_bits))
                    one_l = jnp.zeros_like(inv_m).at[..., 0].set(1)
                    v = vecfield._mont_mul(fc, inv_m, one_l)  # from Montgomery
                elif kind == "shrmask":
                    a = w[:, srcs[0]]  # (B, G, 16)
                    shift, mask = meta
                    ls = (shift // 16)[None, :, None]
                    bs = (shift % 16).astype(jnp.uint32)[None, :, None]
                    j = jnp.arange(NUM_LIMBS, dtype=jnp.int32)[None, None, :]
                    src_j = j + ls
                    take = jnp.clip(src_j, 0, NUM_LIMBS - 1)
                    v0 = jnp.take_along_axis(a, jnp.broadcast_to(take, a.shape), axis=2)
                    v0 = jnp.where(src_j < NUM_LIMBS, v0, 0)
                    take1 = jnp.clip(src_j + 1, 0, NUM_LIMBS - 1)
                    v1 = jnp.take_along_axis(a, jnp.broadcast_to(take1, a.shape), axis=2)
                    v1 = jnp.where(src_j + 1 < NUM_LIMBS, v1, 0)
                    v = ((v0 >> bs) | (v1 << (16 - bs))) & jnp.uint32(0xFFFF)
                    # apply mask: m==0 means no mask
                    m = mask[None, :, None]
                    qm = m // 16
                    rm = (m % 16).astype(jnp.uint32)
                    keep_full = j < qm
                    boundary = j == qm
                    bmask = (jnp.uint32(1) << rm) - jnp.uint32(1)
                    masked = jnp.where(
                        keep_full, v, jnp.where(boundary, v & bmask, jnp.uint32(0))
                    )
                    v = jnp.where(m == 0, v, masked)
                else:  # pragma: no cover
                    raise AssertionError(kind)
                w = w.at[:, dst].set(v)
            return w

        return run

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    @functools.cached_property
    def _run_jit(self):
        from ..utils.xjit import fjit

        return fjit(self._device_program())

    def generate(self, instances: list[dict]) -> np.ndarray:
        """Generate witnesses for a batch.

        ``instances``: per instance a dict {input_cell_idx: int value}.
        Returns (B, num_cells, 16) uint32 standard-form witness limbs.
        """
        b = len(instances)
        n_in = len(self.input_idx)
        inputs = np.zeros((b, n_in, NUM_LIMBS), np.uint32)
        bigvals = np.zeros((b, len(self._big_cells), NUM_LIMBS), np.uint32)
        big_pos = {c: k for k, c in enumerate(self._big_cells)}
        for bi, inst in enumerate(instances):
            assert set(inst.keys()) == set(self.input_idx), "input cells mismatch"
            for k, c in enumerate(self.input_idx):
                inputs[bi, k] = _int_limbs(inst[c])
            bv = self._host_bigops(inst)
            for c, v in bv.items():
                bigvals[bi, big_pos[c]] = _int_limbs(v)
        w = self._run_jit(jnp.asarray(inputs), jnp.asarray(bigvals))
        return np.asarray(w)


def _int_limbs(x: int) -> np.ndarray:
    return np.frombuffer(x.to_bytes(32, "little"), np.uint16).astype(np.uint32)
