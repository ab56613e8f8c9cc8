import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from halo2_rsa_tpu.fields import vecfield, pallas_mont
from halo2_rsa_tpu.fields.field import BN254_FR
from halo2_rsa_tpu.fields.vecfield import _rolled
from halo2_rsa_tpu.prover import ntt, msm, curve, g1_vec
fc = vecfield.consts(BN254_FR)
rng = np.random.default_rng(0)
print('mode:', 'rolled' if _rolled() else 'unrolled')
def sync(r):
    if isinstance(r, tuple): r = r[0]
    return int(np.asarray(jnp.max(r)))
def bench(name, fn, iters=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters): sync(fn())
    dt = (time.perf_counter() - t0) / iters
    print(name, round(dt, 5))
    return dt
n = 1 << 20
a = jnp.asarray(rng.integers(0, 1<<16, (n,16), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1<<16, (n,16), dtype=np.uint32))
t = bench('mont_mul_2^20', lambda: vecfield.mont_mul(fc, a, b)); print('  ->', round(n/t/1e6,1), 'Mel/s')
t = bench('pallas_mont_2^20', lambda: pallas_mont.mont_mul_pallas(fc, a, b)); print('  ->', round(n/t/1e6,1), 'Mel/s')
x = jnp.asarray(rng.integers(0, 1<<16, (1<<18,16), dtype=np.uint32))
bench('ntt_2^18', lambda: ntt.ntt(x, 18))
xb = jnp.asarray(rng.integers(0, 1<<16, (8, 1<<15,16), dtype=np.uint32))
bench('ntt_batch8_2^15', lambda: ntt.ntt_batch(xb, 15))
n_msm = 1 << 15
base = [curve.g1_mul(curve.G1_GEN, i + 1) for i in range(64)]
pts = tuple(jnp.tile(c, (n_msm//64, 1)) for c in g1_vec.points_to_device(base))
sc = jnp.asarray(rng.integers(0, 1<<16, (n_msm,16), dtype=np.uint32))
t = bench('msm_2^15', lambda: msm.msm(sc, pts), iters=3); print('  ->', round(n_msm/t/1e3,1), 'Kpts/s')
