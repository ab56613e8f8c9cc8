"""Vectorized constraint checker — the MockProver analog.

halo2's ``MockProver::run(k, circuit, public_inputs)`` + ``verify()`` (used as
the universal test harness by the reference, e.g.
/root/reference/src/big_integer/chip.rs:1433-1458) re-synthesizes the circuit
and then sweeps every row of every gate/lookup/permutation on the CPU.

Here the trace is already vectorized: checking = gather witness limbs by the
gate index arrays and evaluate the 8-coefficient gate relation for *all* rows
at once in the field, entirely on-device. Lookups of one bit-width become one
vectorized bound compare. The evaluation is jittable and row-shardable
(see ``parallel/``).

All evaluation happens in the Montgomery domain: every term of the gate
relation carries exactly one extra factor R, so the relation holds iff the
Montgomery-domain sum is zero.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import vecfield
from ..utils.xjit import fjit
from ..fields.field import NUM_LIMBS, PrimeField
from ..fields.vecfield import FieldConsts, _add, _mont_mul, is_zero
from .builder import Builder


@dataclasses.dataclass(frozen=True, eq=False)
class CompiledCircuit:
    """Frozen, device-ready form of a Builder trace (static per circuit shape)."""

    field: PrimeField
    num_witness: int
    gate_idx: np.ndarray  # (R, 5) int32
    gate_coef_id: np.ndarray  # (R,) int32 — index into coef_table
    coef_table: np.ndarray  # (C, 8, 16) uint32, Montgomery form
    lookup_groups: tuple  # ((bits, idx_array), ...) sorted by bits
    instance_idx: np.ndarray  # (I,) int32

    @property
    def fc(self) -> FieldConsts:
        return vecfield.consts(self.field)

    @property
    def num_gates(self) -> int:
        return self.gate_idx.shape[0]

    @property
    def num_lookups(self) -> int:
        return sum(g[1].shape[0] for g in self.lookup_groups)


def compile_circuit(builder: Builder) -> CompiledCircuit:
    """Freeze a Builder trace into device arrays.

    Coefficient rows are dictionary-encoded: circuits use a tiny set of
    distinct coefficient tuples (op shapes), so the (R,8,16) Montgomery
    coefficient tensor collapses to a (C,8,16) table + (R,) ids.
    """
    field = builder.field
    gate_idx = np.asarray(builder.gate_idx, dtype=np.int32).reshape(-1, 5)

    coef_ids = np.empty(len(builder.gate_coef), dtype=np.int32)
    table: dict[tuple, int] = {}
    for r, row in enumerate(builder.gate_coef):
        hit = table.get(row)
        if hit is None:
            hit = len(table)
            table[row] = hit
        coef_ids[r] = hit
    coef_table = np.empty((len(table), 8, NUM_LIMBS), dtype=np.uint32)
    for row, cid in table.items():
        for k, q in enumerate(row):
            coef_table[cid, k] = _int_to_limbs_np(field.to_mont(q))

    groups: dict[int, list[int]] = {}
    for idx, bits in builder.lookups:
        groups.setdefault(bits, []).append(idx)
    lookup_groups = tuple(
        (bits, np.asarray(idxs, dtype=np.int32)) for bits, idxs in sorted(groups.items())
    )

    return CompiledCircuit(
        field=field,
        num_witness=builder.num_witness,
        gate_idx=gate_idx,
        gate_coef_id=coef_ids,
        coef_table=coef_table,
        lookup_groups=lookup_groups,
        instance_idx=np.asarray(builder.instance, dtype=np.int32),
    )


def _int_to_limbs_np(x: int) -> np.ndarray:
    b = x.to_bytes(NUM_LIMBS * 2, "little")
    return np.frombuffer(b, dtype=np.uint16).astype(np.uint32)


def witness_limbs(builder_or_values) -> np.ndarray:
    """Witness values (Python ints, standard form) -> (W, 16) uint32 limbs."""
    values = (
        builder_or_values.values
        if isinstance(builder_or_values, Builder)
        else builder_or_values
    )
    n = len(values)
    out = np.empty((n, NUM_LIMBS), dtype=np.uint16)
    to_bytes = int.to_bytes
    nbytes = NUM_LIMBS * 2
    buf = bytearray(n * nbytes)
    pos = 0
    for v in values:
        buf[pos : pos + nbytes] = to_bytes(v, nbytes, "little")
        pos += nbytes
    out = np.frombuffer(bytes(buf), dtype=np.uint16).reshape(n, NUM_LIMBS)
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# evaluation kernels (pure functions of arrays; shardable)
# ---------------------------------------------------------------------------


def eval_gates(fc: FieldConsts, gate_idx, coef, w_mont):
    """Evaluate the gate relation for all rows.

    gate_idx (R,5) int32; coef (R,8,16) uint32 Montgomery; w_mont (...,W,16)
    — leading axes batch over witness instances sharing one trace shape.
    Returns (..., R) bool — True where the row is satisfied.
    """
    ws = [w_mont[..., gate_idx[:, k], :] for k in range(5)]
    acc = coef[:, 7]  # q_const (Montgomery ⇒ carries the same single R factor)
    for k in range(5):
        acc = _add(fc, acc, _mont_mul(fc, coef[:, k], ws[k]))
    acc = _add(fc, acc, _mont_mul(fc, coef[:, 5], _mont_mul(fc, ws[0], ws[1])))
    acc = _add(fc, acc, _mont_mul(fc, coef[:, 6], _mont_mul(fc, ws[2], ws[3])))
    return is_zero(acc)


def eval_lookup(vals_std, bits: int):
    """vals_std (K,16) standard-form canonical limbs -> (K,) bool: v < 2^bits."""
    q, rem = divmod(bits, 16)
    ok = jnp.ones(vals_std.shape[:-1], dtype=bool)
    lo = q  # first limb index that must be all-zero
    if rem:
        ok = ok & (vals_std[..., q] < (1 << rem))
        lo = q + 1
    for j in range(lo, NUM_LIMBS):
        ok = ok & (vals_std[..., j] == 0)
    return ok


@functools.partial(fjit, static_argnums=(0, 1))
def _check_jit(fc, lookup_bits, gate_idx, coef_id, coef_table, w_std, lookup_idx):
    w_mont = vecfield._mont_mul(fc, w_std, jnp.broadcast_to(fc.r2_limbs, w_std.shape))
    coef = coef_table[coef_id]
    gate_ok = eval_gates(fc, gate_idx, coef, w_mont)
    gate_violations = jnp.sum(~gate_ok)
    lookup_violations = jnp.zeros((), jnp.int32)
    for bits, idx in zip(lookup_bits, lookup_idx):
        ok = eval_lookup(w_std[idx], bits)
        lookup_violations = lookup_violations + jnp.sum(~ok).astype(jnp.int32)
    return gate_violations, lookup_violations


def check(compiled: CompiledCircuit, w_std) -> dict:
    """Run the full constraint check. ``w_std`` is (W,16) standard-form limbs.

    Returns dict(ok, gate_violations, lookup_violations).
    """
    lookup_bits = tuple(b for b, _ in compiled.lookup_groups)
    lookup_idx = tuple(jnp.asarray(i) for _, i in compiled.lookup_groups)
    gv, lv = _check_jit(
        compiled.fc,
        lookup_bits,
        jnp.asarray(compiled.gate_idx),
        jnp.asarray(compiled.gate_coef_id),
        jnp.asarray(compiled.coef_table),
        jnp.asarray(w_std),
        lookup_idx,
    )
    gv = int(gv)
    lv = int(lv)
    return {"ok": gv == 0 and lv == 0, "gate_violations": gv, "lookup_violations": lv}


def run(builder: Builder, public_inputs: list[int] | None = None) -> dict:
    """One-call MockProver analog: compile, extract witness, check.

    If ``public_inputs`` is given, additionally verifies that the exposed
    instance cells equal them (MockProver::run's public-input argument).
    """
    compiled = compile_circuit(builder)
    w = witness_limbs(builder)
    result = check(compiled, w)
    if public_inputs is not None:
        got = [builder.values[i] for i in compiled.instance_idx]
        want = [x % builder.field.p for x in public_inputs]
        result["instance_ok"] = got == want
        result["ok"] = result["ok"] and result["instance_ok"]
    return result


def failing_gates(compiled: CompiledCircuit, w_std, limit: int = 10) -> list[int]:
    """Debug helper: indices of the first ``limit`` violated gate rows."""
    fc = compiled.fc
    w_mont = vecfield.to_mont(fc, jnp.asarray(w_std))
    coef = jnp.asarray(compiled.coef_table)[jnp.asarray(compiled.gate_coef_id)]
    ok = np.asarray(eval_gates(fc, jnp.asarray(compiled.gate_idx), coef, w_mont))
    return list(np.nonzero(~ok)[0][:limit])


def explain(builder: Builder, w_std=None, limit: int = 10) -> list[dict]:
    """MockProver-grade failure report: locate violated constraints and name
    the gadget op that emitted each.

    The capability of halo2 ``MockProver::verify``'s typed ``VerifyFailure``
    (which the reference drives 44 test circuits off,
    /root/reference/src/big_integer/chip.rs:1433-1458): instead of a bare
    violation count, each entry names the originating gadget-op path
    (recorded by ``Builder.op``), the failing row, its witness cells and
    their values.

    ``w_std``: optional (W, 16) standard-form limb array to check instead of
    the builder's own witness (e.g. a corrupted copy). Returns up to
    ``limit`` entries: {kind, row, op, cells, values} for gates and
    {kind, index, op, cell, value, bits} for lookups.
    """
    compiled = compile_circuit(builder)
    if w_std is None:
        w_std = witness_limbs(builder)
    failures: list[dict] = []

    rows = failing_gates(compiled, w_std, limit)
    values_of = lambda idxs: [_limbs_to_int_np(w_std[i]) for i in idxs]
    for r in rows:
        cells = [int(c) for c in compiled.gate_idx[r]]
        failures.append({
            "kind": "gate",
            "row": int(r),
            "op": builder.gate_tags[r] if r < len(builder.gate_tags) else "",
            "cells": cells,
            "values": values_of(cells),
        })

    if len(failures) < limit:
        w_dev = jnp.asarray(w_std)
        for bits, idx in compiled.lookup_groups:
            ok = np.asarray(eval_lookup(w_dev[jnp.asarray(idx)], bits))
            for j in np.nonzero(~ok)[0]:
                cell = int(idx[j])
                failures.append({
                    "kind": "lookup",
                    "index": int(j),
                    "op": f"range_check[{bits}b]",
                    "cell": cell,
                    "value": _limbs_to_int_np(w_std[cell]),
                    "bits": bits,
                })
                if len(failures) >= limit:
                    break
            if len(failures) >= limit:
                break
    return failures


def format_failures(failures: list[dict]) -> str:
    """Human-readable rendering of :func:`explain` entries."""
    lines = []
    for f in failures:
        if f["kind"] == "gate":
            op = f["op"] or "<untagged>"
            lines.append(
                f"gate row {f['row']} in op '{op}': cells {f['cells']} = "
                f"{[hex(v) for v in f['values']]}"
            )
        else:
            lines.append(
                f"lookup #{f['index']} ({f['op']}): cell {f['cell']} = "
                f"{hex(f['value'])} not < 2^{f['bits']}"
            )
    return "\n".join(lines)


def _limbs_to_int_np(row) -> int:
    x = 0
    for v in reversed(list(np.asarray(row))):
        x = (x << 16) | int(v)
    return x
