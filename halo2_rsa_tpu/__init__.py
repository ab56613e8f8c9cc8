"""halo2_rsa_tpu — a TPU-native zero-knowledge RSA-verification framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
SoraSuegami/halo2-rsa (a Rust halo2 circuit library): limb-decomposed
big-integer constraints, RSA pkcs1v15 signature-verification circuits, a
vectorized constraint checker (MockProver analog), and a KZG proving backend
built on batched Montgomery field kernels, NTT and Pippenger MSM.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  fields/   — L0 field arithmetic: host ints + vectorized Montgomery limb math
  circuit/  — L1 constraint layer: trace builder, main gate, range lookups,
              vectorized checker
  bigint/   — L2 big-integer gadgets (BigIntChip semantics)
  rsa/      — L3/L4 RSA gadgets + pkcs1v15 verifier composition
  sha256/   — L3' SHA-256 circuit gadget
  witness/  — batched (vmapped) witness generation kernels
  prover/   — L0 proving backend: NTT, MSM, KZG, transcript
  parallel/ — multi-chip sharding (mesh, collectives)
  utils/    — profiling, serialization
"""

__version__ = "0.2.0"
