"""Persistence for the expensive proving artifacts.

The reference regenerates ParamsKZG / proving keys per process and never
serializes them (SURVEY.md §5 "Checkpoint/resume: none in-repo"). Here the
SRS and keys are first-class on-disk artifacts (a behavioral superset): the
SRS is the expensive multi-second precomputation, and multi-host runs load
the same artifact on every host.

Format: a plain npz (numpy) container + ints as little-endian byte blobs —
no pickling of code, stable across versions.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..prover import g1_vec, kzg


def _int_to_bytes(x: int) -> bytes:
    return x.to_bytes(48, "little")


def _int_from_bytes(b) -> int:
    return int.from_bytes(bytes(b), "little")


def save_srs(srs: kzg.SRS, path: str) -> None:
    g1 = [np.asarray(c) for c in srs.g1_powers]
    g2t = np.frombuffer(
        b"".join(_int_to_bytes(v) for pair in srs.g2_tau for v in pair), np.uint8
    )
    g2g = np.frombuffer(
        b"".join(_int_to_bytes(v) for pair in srs.g2_gen for v in pair), np.uint8
    )
    np.savez_compressed(
        path, n=srs.n, g1x=g1[0], g1y=g1[1], g1z=g1[2], g2_tau=g2t, g2_gen=g2g
    )


def load_srs(path: str) -> kzg.SRS:
    import jax.numpy as jnp

    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path)

    def g2_from(b):
        vals = [_int_from_bytes(b[i * 48 : (i + 1) * 48]) for i in range(4)]
        return ((vals[0], vals[1]), (vals[2], vals[3]))

    return kzg.SRS(
        n=int(z["n"]),
        g1_powers=(jnp.asarray(z["g1x"]), jnp.asarray(z["g1y"]), jnp.asarray(z["g1z"])),
        g2_gen=g2_from(bytes(z["g2_gen"])),
        g2_tau=g2_from(bytes(z["g2_tau"])),
    )


def _vk_doc(vk) -> dict:
    """VerifyingKey -> JSON-able dict (points as decimal strings)."""

    def pt(p):
        return None if p is None else [str(p[0]), str(p[1])]

    def g2pt(p):
        return [[str(p[0][0]), str(p[0][1])], [str(p[1][0]), str(p[1][1])]]

    return {
        "k": vk.k,
        "n": vk.n,
        "num_wires": vk.num_wires,
        "lookup_bits": list(vk.lookup_bits),
        "fixed_commitments": [pt(c) for c in vk.fixed_commitments],
        "sigma_commitments": [pt(c) for c in vk.sigma_commitments],
        "table_commitments": [pt(c) for c in vk.table_commitments],
        "pub_rows": list(vk.pub_rows),
        "g2_gen": g2pt(vk.srs_g2_gen),
        "g2_tau": g2pt(vk.srs_g2_tau),
    }


def _vk_from_doc(doc: dict):
    from ..prover.plonk import VerifyingKey

    def pt(c):
        return None if c is None else (int(c[0]), int(c[1]))

    def g2pt(c):
        return ((int(c[0][0]), int(c[0][1])), (int(c[1][0]), int(c[1][1])))

    return VerifyingKey(
        k=doc["k"],
        n=doc["n"],
        num_wires=doc["num_wires"],
        lookup_bits=tuple(doc["lookup_bits"]),
        fixed_commitments=[pt(c) for c in doc["fixed_commitments"]],
        sigma_commitments=[pt(c) for c in doc["sigma_commitments"]],
        table_commitments=[pt(c) for c in doc["table_commitments"]],
        pub_rows=doc["pub_rows"],
        srs_g2_gen=g2pt(doc["g2_gen"]),
        srs_g2_tau=g2pt(doc["g2_tau"]),
    )


def save_vk(vk, path: str) -> None:
    """VerifyingKey -> JSON (points as decimal strings)."""
    with open(path, "w") as f:
        json.dump(_vk_doc(vk), f)


def save_pk(pk, path: str) -> None:
    """ProvingKey -> npz. The SRS is NOT embedded (it is its own artifact,
    shared across circuits — pass it to :func:`load_pk`). Matches the
    reference's params/pk/vk persistence boundary (bench.rs:228-239)."""
    arrays = {
        "wire_source": np.asarray(pk.wire_source),
        "id_vals": np.asarray(pk.id_vals),
        "sigma_vals": np.asarray(pk.sigma_vals),
        "fixed_polys": np.asarray(pk.fixed_polys),
        "sigma_polys": np.asarray(pk.sigma_polys),
        "fixed_ext": np.asarray(pk.fixed_ext),
        "sigma_ext": np.asarray(pk.sigma_ext),
        "l0_ext": np.asarray(pk.l0_ext),
        "x_ext": np.asarray(pk.x_ext),
        "van_inv": np.asarray(pk.van_inv),
    }
    if pk.table_vals is not None:
        arrays["table_vals"] = np.asarray(pk.table_vals)
        arrays["table_polys"] = np.asarray(pk.table_polys)
        arrays["table_ext"] = np.asarray(pk.table_ext)
    meta = {
        "log_ext": pk.log_ext,
        "k_cosets": [str(c) for c in pk.k_cosets],
        "g1_tail": [[str(p[0]), str(p[1])] if p is not None else None for p in pk.g1_tail],
        "vk": _vk_doc(pk.vk),
    }
    np.savez_compressed(
        path, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrays
    )


def load_pk(path: str, srs: kzg.SRS):
    import jax.numpy as jnp

    from ..prover.plonk import ProvingKey

    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    has_tables = "table_vals" in z.files
    vk = _vk_from_doc(meta["vk"])
    return ProvingKey(
        vk=vk,
        srs=srs,
        wire_source=z["wire_source"],
        k_cosets=[int(c) for c in meta["k_cosets"]],
        log_ext=int(meta["log_ext"]),
        id_vals=jnp.asarray(z["id_vals"]),
        sigma_vals=jnp.asarray(z["sigma_vals"]),
        table_vals=jnp.asarray(z["table_vals"]) if has_tables else None,
        fixed_polys=jnp.asarray(z["fixed_polys"]),
        sigma_polys=jnp.asarray(z["sigma_polys"]),
        table_polys=jnp.asarray(z["table_polys"]) if has_tables else None,
        fixed_ext=jnp.asarray(z["fixed_ext"]),
        sigma_ext=jnp.asarray(z["sigma_ext"]),
        table_ext=jnp.asarray(z["table_ext"]) if has_tables else None,
        l0_ext=jnp.asarray(z["l0_ext"]),
        x_ext=jnp.asarray(z["x_ext"]),
        van_inv=jnp.asarray(z["van_inv"]),
        g1_tail=[
            (int(p[0]), int(p[1])) if p is not None else None
            for p in meta["g1_tail"]
        ],
    )


def load_vk(path: str):
    with open(path) as f:
        return _vk_from_doc(json.load(f))
