#!/usr/bin/env python
"""Time the flagship prove: RSA pkcs1v15 verify, SHA-2 disabled
(reference's only enabled bench: /root/reference/benches/bench.rs:369-377,
1024-bit key, pre-hashed 32-byte message, k=15).

With ``--sha MSG_LEN`` the circuit includes the in-circuit SHA-256 of a
MSG_LEN-byte message (the reference's disabled k=17/k=18 bench configs,
bench.rs:349-367) and public inputs are n-limbs ++ digest bytes.

Usage: time_flagship_prove.py [bits] [--sha MSG_LEN] [--json out.json]

Phases: circuit build (trace), SRS setup, keygen, prove (cold+warm with the
per-round witness/NTT/MSM/open breakdown from utils.profiling.Phases), verify.
Emits one JSON line on stdout with every number BASELINE.md's table needs.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from halo2_rsa_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


import json
import random
import sys
import time

t_import0 = time.perf_counter()
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import padding as cpad, rsa as crsa

from halo2_rsa_tpu.circuit import Builder, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.prover import kzg, plonk
from halo2_rsa_tpu.rsa import DEFAULT_E, RSAChip, RSAPubE, RSAPublicKey, RSASignature
from halo2_rsa_tpu.utils.profiling import Phases
import hashlib

print(f"imports: {time.perf_counter()-t_import0:.1f}s", file=sys.stderr)

json_out = None
sha_len = None
keys_dir = None
argv = sys.argv[1:]
if "--json" in argv:
    i = argv.index("--json")
    json_out = argv[i + 1]
    argv = argv[:i] + argv[i + 2 :]
if "--sha" in argv:
    i = argv.index("--sha")
    sha_len = int(argv[i + 1])
    argv = argv[:i] + argv[i + 2 :]
if "--keys" in argv:
    i = argv.index("--keys")
    keys_dir = argv[i + 1]
    argv = argv[:i] + argv[i + 2 :]
args = [a for a in argv if not a.startswith("--")]
bits = int(args[0]) if args else 1024

rng = random.Random(7)
msg = bytes(rng.randrange(256) for _ in range(sha_len if sha_len else 32))
key = crsa.generate_private_key(public_exponent=DEFAULT_E, key_size=bits)
n = key.public_key().public_numbers().n
sig = int.from_bytes(key.sign(msg, cpad.PKCS1v15(), hashes.SHA256()), "big")
digest = hashlib.sha256(msg).digest()

t0 = time.perf_counter()
from halo2_rsa_tpu.pipelines import Pkcs1v15Circuit

if sha_len is not None:
    circ = Pkcs1v15Circuit.build(bits, n, sig, msg=msg)
else:
    circ = Pkcs1v15Circuit.build(
        bits, n, sig, hashed_msg=int.from_bytes(digest, "big")
    )
b = circ.builder
t1 = time.perf_counter()
print(f"trace build: {t1-t0:.2f}s  stats={b.stats()}", file=sys.stderr)

compiled = checker.compile_circuit(b)
t2 = time.perf_counter()
print(
    f"compile: {t2-t1:.2f}s gates={compiled.num_gates} wit={compiled.num_witness} lookups={compiled.num_lookups}",
    file=sys.stderr,
)

k = max(
    compiled.num_gates + len(compiled.instance_idx),
    compiled.num_witness // 5 + 1,
).bit_length()
print(f"choosing k={k}", file=sys.stderr)
keys_loaded = False
if keys_dir:
    from halo2_rsa_tpu.utils.serialization import load_or_keygen

    srs, pk, vk, keys_loaded = load_or_keygen(compiled, k, keys_dir, tau=777)
    t3 = t4 = time.perf_counter()
    print(f"keys {'loaded' if keys_loaded else 'generated+saved'}: "
          f"{t4-t2:.2f}s", file=sys.stderr)
else:
    # SRS must cover the ZK blinding tail: n + BLIND powers (keygen asserts)
    srs = kzg.setup((1 << k) + plonk.BLIND, tau=777)
    t3 = time.perf_counter()
    print(f"srs setup: {t3-t2:.2f}s", file=sys.stderr)

    pk, vk = plonk.keygen(compiled, srs, k=k)
    t4 = time.perf_counter()
    print(f"keygen: {t4-t3:.2f}s", file=sys.stderr)

pub = circ.public_inputs
ph_cold = Phases()
proof = plonk.prove(pk, b.values, pub, phases=ph_cold)
t5 = time.perf_counter()
print(
    f"prove(cold): {t5-t4:.2f}s  proof_bytes={len(proof)}\n"
    f"  phases: {ph_cold.dump()}",
    file=sys.stderr,
)

ok = plonk.verify(vk, proof, pub)
t6 = time.perf_counter()
print(f"verify(cold): {t6-t5:.2f}s  ok={ok}", file=sys.stderr)
assert ok
# warm verify: the cold one pays the ~60-90 s one-time compile of the
# verifier's small fold-MSM class
verify_warm = []
for _ in range(3):
    t6b = time.perf_counter()
    assert plonk.verify(vk, proof, pub)
    verify_warm.append(time.perf_counter() - t6b)
print(f"verify(warm x3): {['%.3f' % v for v in verify_warm]}", file=sys.stderr)

# warm proves (compiled graphs cached) — the steady-state proving rate
warm = []
ph_warm = Phases()
for _ in range(3):
    t7 = time.perf_counter()
    plonk.prove(pk, b.values, pub, phases=ph_warm)
    warm.append(time.perf_counter() - t7)
print(
    f"prove(warm x{len(warm)}): {['%.2f' % w for w in warm]}s\n"
    f"  phases(sum): {ph_warm.dump()}",
    file=sys.stderr,
)

import jax

result = {
    "config": (
        f"pkcs1v15_rsa{bits}_sha{sha_len}B_k{k}"
        if sha_len is not None
        else f"pkcs1v15_rsa{bits}_sha_disabled_k{k}"
    ),
    "device": str(jax.devices()[0]),
    "k": k,
    "gates": int(compiled.num_gates),
    "witness_cells": int(compiled.num_witness),
    "lookups": int(compiled.num_lookups),
    "proof_bytes": len(proof),
    "keys_loaded_from_disk": keys_loaded,
    "srs_setup_s": round(t3 - t2, 3),
    "keygen_s": round(t4 - t3, 3),
    "prove_cold_s": round(t5 - t4, 3),
    "prove_warm_s": round(min(warm), 3),
    "verify_s": round(t6 - t5, 3),
    "verify_warm_s": round(min(verify_warm), 3),
    "phases_cold": ph_cold.report()["phases_s"],
    "phases_warm_avg": {
        kk: round(v / len(warm), 4) for kk, v in ph_warm.times.items()
    },
}
print(json.dumps(result))
if json_out:
    with open(json_out, "w") as f:
        json.dump(result, f, indent=1)
