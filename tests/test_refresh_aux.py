"""RefreshAux unit tests (mirror /root/reference/src/big_integer/mod.rs:490-529)."""

import random

from halo2_rsa_tpu.bigint import RefreshAux


def test_refresh_aux_1x1_limb32():
    """Pinned value from the reference's Debug-format test (mod.rs:509):
    limb_width=32, l=r=1 -> increased_limbs_vec == [1, 0]."""
    aux = RefreshAux(32, 1, 1)
    assert list(aux.increased_limbs_vec) == [1, 0]


def test_refresh_aux_symmetry_random():
    """Swapping l and r leaves the carry schedule unchanged (mod.rs:513-529)."""
    rng = random.Random(0)
    for _ in range(5):
        l = rng.randrange(1, 257)
        r = rng.randrange(1, 257)
        a0 = RefreshAux(32, l, r).increased_limbs_vec
        a1 = RefreshAux(32, r, l).increased_limbs_vec
        assert a0 == a1


def test_refresh_aux_64bit_square():
    """The 32x32-limb 64-bit case used by RSA-2048 refresh."""
    aux = RefreshAux(64, 32, 32)
    v = aux.increased_limbs_vec
    assert len(v) == 64
    # every muled limb of a 2048x2048 product spills at least one carry limb
    assert v[0] >= 1 and v[62] >= 1
    assert v[-1] == 0
