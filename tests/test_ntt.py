"""NTT tests: host-DFT parity, roundtrip, convolution."""

import random

from halo2_rsa_tpu.fields import BN254_FR, vecfield
from halo2_rsa_tpu.prover import ntt

FR = vecfield.consts(BN254_FR)
R = BN254_FR.p


def test_root_of_unity():
    for log_n in (1, 4, 20, 28):
        w = ntt.root_of_unity(log_n)
        assert pow(w, 1 << log_n, R) == 1
        assert pow(w, 1 << (log_n - 1), R) != 1


def test_ntt_matches_host_dft():
    rng = random.Random(0)
    for log_n in (2, 3, 4):
        n = 1 << log_n
        vals = [rng.randrange(R) for _ in range(n)]
        want = ntt.ntt_host(vals)
        a = vecfield.from_ints(FR, vals, mont=True)
        got = vecfield.to_ints(FR, ntt.ntt(a, log_n))
        assert got == want


def test_roundtrip():
    rng = random.Random(1)
    log_n = 10
    vals = [rng.randrange(R) for _ in range(1 << log_n)]
    a = vecfield.from_ints(FR, vals, mont=True)
    back = vecfield.to_ints(FR, ntt.intt(ntt.ntt(a, log_n), log_n))
    assert back == vals


def test_convolution():
    """intt(ntt(a) * ntt(b)) == a * b mod (X^N - 1)."""
    rng = random.Random(2)
    log_n = 5
    n = 1 << log_n
    a_c = [rng.randrange(R) for _ in range(n // 2)] + [0] * (n // 2)
    b_c = [rng.randrange(R) for _ in range(n // 2)] + [0] * (n // 2)
    want = [0] * n
    for i, x in enumerate(a_c):
        for j, y in enumerate(b_c):
            want[(i + j) % n] = (want[(i + j) % n] + x * y) % R
    a = vecfield.from_ints(FR, a_c, mont=True)
    b = vecfield.from_ints(FR, b_c, mont=True)
    prod = vecfield._mont_mul(FR, ntt.ntt(a, log_n), ntt.ntt(b, log_n))
    got = vecfield.to_ints(FR, ntt.intt(prod, log_n))
    assert got == want
