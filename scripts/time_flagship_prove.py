#!/usr/bin/env python
"""Time the flagship prove: RSA-1024 pkcs1v15 verify, SHA-2 disabled
(reference's only enabled bench: /root/reference/benches/bench.rs:369-377).

Phases: circuit build (trace), SRS setup, keygen, prove, verify.
"""

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
import hashlib

print(f"imports: {time.perf_counter()-t_import0:.1f}s", file=sys.stderr)

bits = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

rng = random.Random(7)
msg = bytes(rng.randrange(256) for _ in range(32))
key = crsa.generate_private_key(public_exponent=DEFAULT_E, key_size=bits)
n = key.public_key().public_numbers().n
sig = int.from_bytes(key.sign(msg, cpad.PKCS1v15(), hashes.SHA256()), "big")
digest = hashlib.sha256(msg).digest()

t0 = time.perf_counter()
b = Builder(BN254_FR)
rsa_chip = RSAChip(b, bits, 5)
pk_a = rsa_chip.assign_public_key(RSAPublicKey(n, RSAPubE.fix(DEFAULT_E)))
sig_a = rsa_chip.assign_signature(RSASignature(sig))
# hashed message as a 4-limb assigned integer (digest little-endian)
hashed = rsa_chip.bigint_chip.assign_integer(
    int.from_bytes(digest, "big"), num_limbs=4
)
is_valid = rsa_chip.verify_pkcs1v15_signature(pk_a, hashed, sig_a)
rsa_chip.main_gate.assert_one(is_valid)
for limb in pk_a.n.limbs:
    b.expose_public(limb)
t1 = time.perf_counter()
print(f"trace build: {t1-t0:.2f}s  stats={b.stats()}", file=sys.stderr)

compiled = checker.compile_circuit(b)
t2 = time.perf_counter()
print(
    f"compile: {t2-t1:.2f}s gates={compiled.num_gates} wit={compiled.num_witness} lookups={compiled.num_lookups}",
    file=sys.stderr,
)

import math

k = max(compiled.num_gates, compiled.num_witness // 5 + 1).bit_length()
print(f"choosing k={k}", file=sys.stderr)
srs = kzg.setup(1 << k, tau=777)
t3 = time.perf_counter()
print(f"srs setup: {t3-t2:.2f}s", file=sys.stderr)

pk, vk = plonk.keygen(compiled, srs, k=k)
t4 = time.perf_counter()
print(f"keygen: {t4-t3:.2f}s", file=sys.stderr)

pub = [(n >> (64 * i)) & ((1 << 64) - 1) for i in range(bits // 64)]
proof = plonk.prove(pk, b.values, pub)
t5 = time.perf_counter()
print(f"prove: {t5-t4:.2f}s  proof_bytes={len(proof)}", file=sys.stderr)

ok = plonk.verify(vk, proof, pub)
t6 = time.perf_counter()
print(f"verify: {t6-t5:.2f}s  ok={ok}", file=sys.stderr)
assert ok

# second prove (warm caches)
t7 = time.perf_counter()
proof2 = plonk.prove(pk, b.values, pub)
t8 = time.perf_counter()
print(f"prove(warm): {t8-t7:.2f}s", file=sys.stderr)
