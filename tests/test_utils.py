"""Serialization + profiling subsystem tests."""

import os
import tempfile

from halo2_rsa_tpu.circuit import Builder, MainGate, checker
from halo2_rsa_tpu.fields import BN254_FR
from halo2_rsa_tpu.prover import kzg, plonk
from halo2_rsa_tpu.utils import Phases, serialization


def test_srs_roundtrip(tmp_path):
    srs = kzg.setup(16, tau=424242)
    p = str(tmp_path / "srs.npz")
    serialization.save_srs(srs, p)
    srs2 = serialization.load_srs(p)
    assert srs2.n == srs.n
    assert srs2.g2_tau == srs.g2_tau
    assert srs2.g1_affine() == srs.g1_affine()


import pytest


@pytest.fixture(scope="module")
def snark_fixture():
    """ONE tiny circuit + keys + proof shared by the roundtrip tests:
    the prover class set compiles once per module (each prove used to
    recompile its own shapes — ~145 s per test on the 2-CPU tier host)."""
    b = Builder(BN254_FR)
    mg = MainGate(b)
    x = mg.assign_value(9)
    y = mg.assign_value(4)
    out = mg.mul_add(x, y, x)
    b.expose_public(out)
    compiled = checker.compile_circuit(b)
    srs = kzg.setup(1 << 7, tau=998877)
    pk, vk = plonk.keygen(compiled, srs, k=5)
    proof = plonk.prove(pk, b.values, [9 * 4 + 9])
    return b, srs, pk, vk, proof


def test_vk_roundtrip_and_verify(tmp_path, snark_fixture):
    _, _, _, vk, proof = snark_fixture
    p = str(tmp_path / "vk.json")
    serialization.save_vk(vk, p)
    vk2 = serialization.load_vk(p)
    assert plonk.verify(vk2, proof, [9 * 4 + 9])
    assert not plonk.verify(vk2, proof, [43])


def test_pk_roundtrip_prove_from_loaded_artifacts(tmp_path, snark_fixture):
    """Full persistence flow (VERDICT r1 #8): save SRS+pk+vk, reload all
    three from disk, prove and verify from the loaded artifacts only.
    Shapes match :func:`snark_fixture`'s prove, so the reload-prove hits
    the already-compiled classes."""
    b, srs, pk, vk, _ = snark_fixture
    sp = str(tmp_path / "srs.npz")
    pp = str(tmp_path / "pk.npz")
    vp = str(tmp_path / "vk.json")
    serialization.save_srs(srs, sp)
    serialization.save_pk(pk, pp)
    serialization.save_vk(vk, vp)

    srs2 = serialization.load_srs(sp)
    pk2 = serialization.load_pk(pp, srs2)
    vk2 = serialization.load_vk(vp)
    proof = plonk.prove(pk2, b.values, [9 * 4 + 9])
    assert plonk.verify(vk2, proof, [9 * 4 + 9])
    assert not plonk.verify(vk2, proof, [1])


def test_phases():
    ph = Phases()
    with ph.phase("msm", points=100):
        pass
    with ph.phase("msm"):
        pass
    rep = ph.report()
    assert rep["counts"]["msm"] == 2
    assert "msm" in rep["phases_s"]
    assert ph.rate("msm", 100) > 0


def test_ptau_roundtrip(tmp_path):
    """snarkjs .ptau container: write our SRS in ceremony layout, ingest it
    back (Montgomery decode + on-curve checks), KZG round trip with it."""
    srs = kzg.setup(16, tau=13131313)
    p = str(tmp_path / "toy.ptau")
    serialization.save_srs_ptau(srs, p, power=4)
    srs2 = serialization.load_srs_ptau(p, 16)
    assert srs2.g1_affine() == srs.g1_affine()
    assert srs2.g2_tau == srs.g2_tau and srs2.g2_gen == srs.g2_gen

    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    c = kzg.commit(srs2, coeffs)
    v, pi = kzg.open_at(srs2, coeffs, 12345)
    assert v == sum(a * pow(12345, i, kzg.R) for i, a in enumerate(coeffs)) % kzg.R
    assert kzg.verify_open(srs2, c, 12345, v, pi)


def test_ptau_rejects_corrupt_point(tmp_path):
    import pytest

    srs = kzg.setup(8, tau=777)
    p = str(tmp_path / "bad.ptau")
    serialization.save_srs_ptau(srs, p, power=3)
    data = bytearray(open(p, "rb").read())
    # corrupt the y coordinate of tauG1[1] (section 2 starts after header)
    secs = serialization._ptau_sections(bytes(data))
    off, _ = secs[2]
    data[off + 3 * 32] ^= 1
    open(p, "wb").write(bytes(data))
    with pytest.raises(AssertionError):
        serialization.load_srs_ptau(p, 8)
