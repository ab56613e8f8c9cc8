#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line.

Primary metric (BASELINE.md config #5 / the reference's only enabled bench,
/root/reference/benches/bench.rs:369-408): **end-to-end proof time** for
pkcs1v15 RSA-1024 verification, SHA-disabled, on the real TPU — steady-state
(warm) prove with the cold prove, keygen, verify and the per-phase
witness/NTT/MSM/open breakdown in `detail`.

Also measured (detail): mul_mod 2048 constraint-check throughput at a
chip-loading batch (config #1) and MSM points/s at N=2^15.

The reference publishes no numbers (BASELINE.md), so vs_baseline is 1.0 by
convention. A persistent XLA compilation cache under .jax_cache makes driver
re-runs skip the cold-compile cost.
"""

import json
import os
import random
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _enable_cache():
    # env alone is too late when sitecustomize pre-imports jax; config
    # update works until the first compilation (utils/cache.py)
    from halo2_rsa_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()


def bench_checker(out):
    """mul_mod-2048 constraint checks/s, batch 256 (BASELINE config #1)."""
    import numpy as np

    from halo2_rsa_tpu.bigint import BigIntChip
    from halo2_rsa_tpu.circuit import Builder, checker
    from halo2_rsa_tpu.fields import BN254_FR

    bits = 2048
    B = 256
    rng = random.Random(0)
    n_v = 0
    while n_v.bit_length() != bits:
        n_v = rng.getrandbits(bits)

    def build(seed):
        r = random.Random(seed)
        a_v = r.getrandbits(bits) % n_v
        b_v = r.getrandbits(bits) % n_v
        b = Builder(BN254_FR)
        chip = BigIntChip(b, 64, bits)
        a = chip.assign_integer(a_v)
        bb = chip.assign_integer(b_v)
        n = chip.assign_integer(n_v)
        res = chip.mul_mod(a, bb, n)
        ans = chip.assign_integer((a_v * b_v) % n_v)
        chip.assert_equal_fresh(res, ans)
        return b

    # one trace shape; batch the witnesses (replicate 4 real instances)
    builders = [build(s) for s in range(4)]
    compiled = checker.compile_circuit(builders[0])
    w4 = np.stack([checker.witness_limbs(bld) for bld in builders])
    w = np.tile(w4, (B // 4, 1, 1))

    import jax
    import jax.numpy as jnp

    lookup_bits = tuple(b for b, _ in compiled.lookup_groups)
    lookup_idx = tuple(jnp.asarray(i) for _, i in compiled.lookup_groups)
    gate_idx = jnp.asarray(compiled.gate_idx)
    coef_id = jnp.asarray(compiled.gate_coef_id)
    coef_table = jnp.asarray(compiled.coef_table)

    # batched direct evaluation (explicit batch axis — no vmap, so the
    # fused Pallas field kernels stay on their primary path)
    from halo2_rsa_tpu.circuit.checker import eval_gates, eval_lookup
    from halo2_rsa_tpu.fields import vecfield

    fc = compiled.fc

    @jax.jit
    def check_all(wb):
        wm = vecfield._mont_mul(fc, wb, jnp.broadcast_to(fc.r2_limbs, wb.shape))
        ok = eval_gates(fc, gate_idx, coef_table[coef_id], wm)  # (B, R)
        viol = jnp.sum(~ok, axis=-1).astype(jnp.int32)
        for bits_, idx in zip(lookup_bits, lookup_idx):
            viol = viol + jnp.sum(
                ~eval_lookup(wb[:, idx], bits_), axis=-1
            ).astype(jnp.int32)
        return viol

    # Chained timing: the tunneled TPU's block_until_ready does not cover
    # execution, so each iteration's INPUT depends on the previous OUTPUT
    # (adding min(viol,0)==0, which the compiler cannot fold away) and one
    # host readback at the end covers the whole chain.
    @jax.jit
    def check_step(wb):
        viol = check_all(wb)
        dep = jnp.minimum(viol, 0).astype(jnp.uint32)  # always 0, data-dep
        return wb + dep[:, None, None], viol

    wb = jnp.asarray(w)
    _, viol = check_step(wb)
    assert (np.asarray(viol) == 0).all()
    iters = 10
    t0 = time.perf_counter()
    x = wb
    for _ in range(iters):
        x, viol = check_step(x)
    assert int(jnp.sum(viol)) == 0
    dt = time.perf_counter() - t0
    out["mulmod2048_checks_per_s"] = round(B * iters / dt, 1)
    out["checker_gate_rows"] = int(compiled.num_gates)
    out["checker_batch"] = B


def bench_msm(out):
    """MSM points/s at N=2^15 (BASELINE metric 'MSM points/s/chip')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo2_rsa_tpu.prover import curve, g1_vec, msm

    n_msm = 1 << 15
    rng = np.random.default_rng(0)
    base = [curve.g1_mul(curve.G1_GEN, i + 1) for i in range(64)]
    pts_small = g1_vec.points_to_device(base)
    reps = n_msm // 64
    pts = tuple(jnp.tile(c, (reps, 1)) for c in pts_small)
    sc = jnp.asarray(rng.integers(0, 1 << 16, (n_msm, 16), dtype=np.uint32))

    # per-iteration readback timing: one int() readback per MSM is a real
    # sync through the tunnel (~25 ms, conservatively included in the
    # reported time). Chained timing is NOT valid here since r5: a chain
    # whose inputs depend on a previous exported-call output stalls the
    # AOT dispatch path (~0.6 s/link measured) and measures that stall,
    # not the kernel.
    def msm_step(s):
        r = msm.msm(s, pts)
        return jnp.bitwise_xor(s, jnp.broadcast_to(r[0][None, :], s.shape) & 1)

    s = msm_step(sc)
    _ = int(jnp.sum(s))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s2 = msm_step(s)
        _ = int(jnp.sum(s2))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    out["msm15_points_per_s"] = round(n_msm / dt, 0)
    out["msm15_s"] = round(dt, 4)


def bench_flagship(out):
    """Prove+verify pkcs1v15 RSA-1024 SHA-disabled (bench.rs:369-408)."""
    from halo2_rsa_tpu.circuit import checker
    from halo2_rsa_tpu.pipelines import Pkcs1v15Circuit, sign_fixture
    from halo2_rsa_tpu.prover import kzg, plonk
    from halo2_rsa_tpu.utils.profiling import Phases
    import hashlib

    bits = 1024
    msg = bytes(random.Random(7).randrange(256) for _ in range(32))
    n, sig = sign_fixture(bits, msg)
    hashed = int.from_bytes(hashlib.sha256(msg).digest(), "big")
    t0 = time.perf_counter()
    circ = Pkcs1v15Circuit.build(bits, n, sig, hashed_msg=hashed)
    compiled = circ.compile()
    out["flagship_trace_s"] = round(time.perf_counter() - t0, 2)

    k = max(
        compiled.num_gates + 20, compiled.num_witness // 5 + 1
    ).bit_length()
    t0 = time.perf_counter()
    # keygen-once, load-thereafter: pk/vk/SRS are on-disk artifacts keyed by
    # the circuit fingerprint (the reference's persistence boundary,
    # bench.rs:228-239, made durable — VERDICT r3 ask #3)
    from halo2_rsa_tpu.utils.serialization import load_or_keygen

    srs, pk, vk, loaded = load_or_keygen(
        compiled, k, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".keys"),
        tau=777,
    )
    out["flagship_setup_keygen_s"] = round(time.perf_counter() - t0, 2)
    out["flagship_keys_loaded"] = loaded
    out["flagship_k"] = k
    out["flagship_gates"] = int(compiled.num_gates)

    ph = Phases()
    t0 = time.perf_counter()
    proof = plonk.prove(pk, circ.builder.values, circ.public_inputs, phases=ph)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    assert plonk.verify(vk, proof, circ.public_inputs)
    out["flagship_verify_cold_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    assert plonk.verify(vk, proof, circ.public_inputs)
    out["flagship_verify_s"] = round(time.perf_counter() - t0, 3)

    ph_w = Phases()
    t0 = time.perf_counter()
    plonk.prove(pk, circ.builder.values, circ.public_inputs, phases=ph_w)
    warm = time.perf_counter() - t0
    out["flagship_prove_cold_s"] = round(cold, 2)
    out["flagship_prove_warm_s"] = round(warm, 2)
    out["flagship_phases_warm"] = {kk: round(v, 3) for kk, v in ph_w.times.items()}
    out["flagship_proof_bytes"] = len(proof)
    return warm


def bench_sha_configs(out):
    """Surface the measured SHA-enabled big-config proves (k=17/k=18 —
    the reference's bench.rs:349-367 configs), recorded by
    scripts/time_flagship_prove.py runs on this machine."""
    here = os.path.dirname(os.path.abspath(__file__))
    for name, key in (
        ("FLAGSHIP_1024_SHA64.json", "sha64"),
        ("FLAGSHIP_1024_SHA128.json", "sha128"),
        ("FLAGSHIP_2048_SHA128.json", "sha128_rsa2048"),
    ):
        path = os.path.join(here, name)
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            out[f"{key}_config"] = d.get("config")
            out[f"{key}_prove_warm_s"] = d.get("prove_warm_s")
            out[f"{key}_verify_s"] = d.get("verify_warm_s", d.get("verify_s"))
    import glob

    smokes = sorted(glob.glob(os.path.join(here, "TPU_SMOKE_r*.json")))
    if smokes:
        with open(smokes[-1]) as f:
            s = json.load(f)
        out["tpu_smoke_passed"] = s.get("all_passed")
        out["tpu_smoke_wall_s"] = s.get("wall_s")
        out["tpu_smoke_artifact"] = os.path.basename(smokes[-1])


def main():
    import jax

    _enable_cache()
    detail = {"device": str(jax.devices()[0])}
    primary = None
    # throughput micro-benches run BEFORE the flagship: the resident
    # proving key + prover queue state measurably slows a same-process
    # MSM bench afterwards (0.11 s -> 1.0 s per 2^15 MSM, measured r5)
    try:
        bench_msm(detail)
    except Exception as e:
        detail["msm_error"] = repr(e)[:300]
    try:
        bench_checker(detail)
    except Exception as e:
        detail["checker_error"] = repr(e)[:300]
    try:
        primary = bench_flagship(detail)
        metric, value, unit = (
            "pkcs1v15_rsa1024_prove_s",
            round(primary, 3),
            "seconds (warm prove, SHA-disabled, k=%d)" % detail["flagship_k"],
        )
    except Exception as e:  # record the failure, fall back to throughput
        detail["flagship_error"] = repr(e)[:300]
        metric = value = None
    try:
        bench_sha_configs(detail)
    except Exception as e:
        detail["sha_configs_error"] = repr(e)[:300]
    if metric is None:
        metric, value, unit = (
            "mulmod2048_constraint_checks_per_s",
            detail.get("mulmod2048_checks_per_s", 0.0),
            "mul_mod instances/s",
        )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": unit,
                "vs_baseline": 1.0,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
