#!/usr/bin/env python
"""Instrumented warm prove: wraps every device-side building block of
``plonk.prove`` with a forced-sync timer to localize where warm prove time
goes. Forced syncs add one tunnel round trip (~25 ms) per call, so the sum
slightly exceeds an uninstrumented prove — the per-op numbers are what
matter.

Usage: python scripts/profile_prove.py [bits]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from halo2_rsa_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import collections
import functools
import json
import random
import sys
import time

import jax.numpy as jnp


TIMES = collections.defaultdict(float)
COUNTS = collections.defaultdict(int)


def _sync(x):
    if isinstance(x, (tuple, list)):
        for c in x:
            _sync(c)
    elif hasattr(x, "block_until_ready"):
        # force a real sync: tiny readback (block_until_ready is a no-op
        # through the axon relay)
        float(jnp.sum(x.ravel()[:1]))


def wrap(mod, name, label=None):
    fn = getattr(mod, name)
    lbl = label or f"{mod.__name__.split('.')[-1]}.{name}"

    @functools.wraps(fn)
    def timed(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        _sync(out)
        dt = time.perf_counter() - t0
        TIMES[lbl] += dt
        COUNTS[lbl] += 1
        return out

    setattr(mod, name, timed)


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    import hashlib

    from halo2_rsa_tpu import pipelines
    from halo2_rsa_tpu.circuit import checker
    from halo2_rsa_tpu.fields import vecfield
    from halo2_rsa_tpu.prover import kzg, msm, ntt, plonk

    rng = random.Random(7)
    msg = bytes(rng.randrange(256) for _ in range(32))
    n, sig = pipelines.sign_fixture(bits, msg)
    hashed = int.from_bytes(hashlib.sha256(msg).digest(), "big")
    circ = pipelines.Pkcs1v15Circuit.build(bits, n, sig, hashed_msg=hashed)
    compiled = checker.compile_circuit(circ.builder)
    k = max(compiled.num_gates, compiled.num_witness // 5 + 1).bit_length()
    srs = kzg.setup((1 << k) + plonk.BLIND, tau=777)
    pk, vk = plonk.keygen(compiled, srs, k=k)

    # warm everything once
    proof = plonk.prove(pk, circ.builder.values, circ.public_inputs)
    assert plonk.verify(vk, proof, circ.public_inputs)
    print("warmed; instrumenting", file=sys.stderr, flush=True)

    # instrument AFTER warm-up so compiles are excluded
    wrap(msm, "msm_many")
    wrap(ntt, "intt_batch")
    wrap(ntt, "ntt_batch")
    wrap(ntt, "intt")
    wrap(plonk, "_coset_eval_batch")
    wrap(plonk, "_round2_graph")
    wrap(plonk, "_round3_graph")
    wrap(plonk, "_batch_eval_graph")
    wrap(plonk, "_fold_graph")
    wrap(plonk, "_gather_wires")
    wrap(plonk, "_apply_blind")
    wrap(plonk, "_m_counts")
    wrap(plonk, "_counts_to_mont")
    wrap(kzg, "_quotient_graph")
    wrap(vecfield, "pow_series")
    wrap(vecfield, "to_mont")
    wrap(vecfield, "from_mont")
    wrap(vecfield, "to_ints", "host.to_ints")
    wrap(vecfield, "from_ints", "host.from_ints")
    from halo2_rsa_tpu.prover import g1_vec

    wrap(g1_vec, "points_from_device", "host.points_from_device")

    from halo2_rsa_tpu.utils.profiling import Phases

    # pass 1 compiles the tiny per-shape sync graphs the instrumentation
    # adds; only pass 2's attribution is clean
    plonk.prove(pk, circ.builder.values, circ.public_inputs)
    TIMES.clear()
    COUNTS.clear()

    ph = Phases()
    t0 = time.perf_counter()
    plonk.prove(pk, circ.builder.values, circ.public_inputs, phases=ph)
    total = time.perf_counter() - t0
    print(f"instrumented warm prove: {total:.2f}s", file=sys.stderr)
    print(f"phases: {ph.dump()}", file=sys.stderr)
    rows = sorted(TIMES.items(), key=lambda kv: -kv[1])
    acc = sum(TIMES.values())
    for lbl, t in rows:
        print(f"{t:8.3f}s  x{COUNTS[lbl]:<3d} {lbl}", file=sys.stderr)
    print(f"{acc:8.3f}s  accounted / {total:.2f}s total", file=sys.stderr)
    print(json.dumps({k2: round(v, 3) for k2, v in rows}))


if __name__ == "__main__":
    main()
