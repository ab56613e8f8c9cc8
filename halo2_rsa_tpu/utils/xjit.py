"""jit wrapper with backend-aware compiler options.

XLA:CPU's ``fusion`` pass is superlinear in graph size for the deep
elementwise field-arithmetic graphs this framework generates (unrolled
16-limb Montgomery CIOS chained through EC formulas): a single complete
point-add takes ~60 s to compile with the pass on and ~7 s with it off,
and whole-prover graphs time out entirely. Fusion is a pure optimization,
so disabling it never changes results — it only trades kernel-launch
overhead for bounded compile time. The CPU backend is the test/dryrun
target (virtual 8-device meshes); the TPU backend keeps its full pass
pipeline (TPU fusion is ~4.5x faster and the bench path needs it).

Use :func:`fjit` everywhere ``jax.jit`` would be used on field/EC graphs.
"""

from __future__ import annotations

import functools

import jax

_CPU_OPTS = {"xla_disable_hlo_passes": "fusion"}


@functools.lru_cache(maxsize=1)
def _cpu_backend() -> bool:
    return jax.default_backend() == "cpu"


def fjit(fun=None, **jit_kwargs):
    """``jax.jit`` that disables XLA:CPU's superlinear fusion pass.

    Backend detection is deferred to the first call so importing this
    module never initializes a JAX backend (tests mutate platform config
    at collection time).
    """
    if fun is None:
        return lambda f: fjit(f, **jit_kwargs)

    cache: dict[bool, object] = {}

    def _trace_clean() -> bool:
        from jax._src import core as _core

        try:
            return bool(_core.trace_state_clean())
        except Exception:
            return True

    @functools.wraps(fun)
    def wrapper(*args, **kwargs):
        # compiler_options is only legal on a TOP-LEVEL jit; when this
        # wrapper is invoked inside another trace the jit is inlined and
        # the outermost jit's options govern.
        top = _trace_clean()
        f = cache.get(top)
        if f is None:
            kw = dict(jit_kwargs)
            if top and _cpu_backend():
                kw.setdefault("compiler_options", _CPU_OPTS)
            f = cache[top] = jax.jit(fun, **kw)
        return f(*args, **kwargs)

    def _clear():
        cache.clear()
        _cpu_backend.cache_clear()

    wrapper._clear_cache = _clear
    return wrapper
