"""jit wrapper with backend-aware compiler options and an AOT trace cache.

XLA:CPU's ``fusion`` pass is superlinear in graph size for the deep
elementwise field-arithmetic graphs this framework generates (unrolled
16-limb Montgomery CIOS chained through EC formulas): a single complete
point-add takes ~60 s to compile with the pass on and ~7 s with it off,
and whole-prover graphs time out entirely. Fusion is a pure optimization,
so disabling it never changes results — it only trades kernel-launch
overhead for bounded compile time. The CPU backend is the test/dryrun
target (virtual 8-device meshes); the TPU backend keeps its full pass
pipeline (TPU fusion is ~4.5x faster and the bench path needs it).

**AOT trace cache (TPU cold path).** Measured on the TPU bench host: a
fresh process pays ~20-30 s of *Python tracing + MLIR lowering* per large
prover class even when the persistent XLA compile cache hits (the compile
itself then costs ~0.3-2 s). The reference has no compile step at all
(halo2's ``create_proof`` is straight native code, bench.rs:319-343), so
cold-start parity demands skipping the retrace: on non-CPU backends every
top-level ``fjit`` call serializes its ``jax.export`` artifact (StableHLO,
a few MB; big operands are arguments, not constants) to
``.jax_cache/aot/``, keyed by a digest of the package source + jax version
+ argument avals + static values. Later processes deserialize in ~5 ms and
go straight to the (persistently cached) XLA compile. Any source edit
anywhere in the package invalidates the whole AOT cache — correctness
over reuse. Disable with ``HALO2_RSA_AOT=0``.

Caveat (measured): a dependency CHAIN of exported calls — each call's
input produced by the previous call's output through eager glue ops —
stalls ~0.6 s per link on the tunneled TPU, where the plain jit path
pipelines. Steady-state prove loops are transcript-synced each round and
unaffected (warm prove times match the pre-AOT pipeline within noise);
microbenchmarks must time with a per-iteration readback, not a chain
(see bench.py bench_msm).

Use :func:`fjit` everywhere ``jax.jit`` would be used on field/EC graphs.
"""

from __future__ import annotations

import functools
import hashlib
import os

import jax

_CPU_OPTS = {"xla_disable_hlo_passes": "fusion"}


@functools.lru_cache(maxsize=1)
def _cpu_backend() -> bool:
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=1)
def _aot_dir() -> str | None:
    """AOT artifact directory, or None when disabled (CPU backend / env)."""
    env = os.environ.get("HALO2_RSA_AOT", "1")
    if env in ("0", "off", ""):
        return None
    if _cpu_backend():
        # CPU jits need per-call compiler_options (the fusion-pass disable),
        # which an exported artifact's compile path does not carry.
        return None
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = os.environ.get(
        "HALO2_RSA_AOT_DIR",
        os.path.join(os.path.dirname(pkg_root), ".jax_cache", "aot"),
    )
    os.makedirs(d, exist_ok=True)
    return d


@functools.lru_cache(maxsize=1)
def _pkg_digest() -> str:
    """Digest of every package source file + the jax version: ANY code
    change invalidates ALL AOT artifacts (stale-executable safety)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256(jax.__version__.encode())
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, pkg_root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()


def _sig(x) -> str:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return f"a{tuple(x.shape)}{x.dtype}"
    if isinstance(x, (bool, int, float)):
        # dynamic Python scalars are weak-typed jit inputs: the compiled
        # code is value-independent, so the key must be too (a transcript
        # challenge passed as int must NOT re-export per value)
        return f"py{type(x).__name__}"
    return f"s{x!r}"


def _aot_key(fun, jit_kwargs, args, kwargs) -> str:
    statics = jit_kwargs.get("static_argnums", ())
    if isinstance(statics, int):
        statics = (statics,)
    names = jit_kwargs.get("static_argnames", ())
    if isinstance(names, str):
        names = (names,)
    h = hashlib.sha256()
    h.update(_pkg_digest().encode())
    h.update(jax.default_backend().encode())
    h.update(f"{fun.__module__}.{fun.__qualname__}".encode())
    h.update(repr(sorted(jit_kwargs.items())).encode())
    for i, a in enumerate(args):
        if i in statics:
            h.update(f"S{a!r}".encode())  # static: value IS the key
        else:
            leaves, treedef = jax.tree_util.tree_flatten(a)
            h.update(str(treedef).encode())
            for leaf in leaves:
                h.update(_sig(leaf).encode())
    for k in sorted(kwargs):
        h.update(k.encode())
        if k in names:
            h.update(f"S{kwargs[k]!r}".encode())
        else:
            leaves, treedef = jax.tree_util.tree_flatten(kwargs[k])
            h.update(str(treedef).encode())
            for leaf in leaves:
                h.update(_sig(leaf).encode())
    return h.hexdigest()[:32]


def fjit(fun=None, **jit_kwargs):
    """``jax.jit`` that (a) disables XLA:CPU's superlinear fusion pass and
    (b) on TPU, persists each traced+lowered class to the AOT cache.

    Backend detection is deferred to the first call so importing this
    module never initializes a JAX backend (tests mutate platform config
    at collection time).
    """
    if fun is None:
        return lambda f: fjit(f, **jit_kwargs)

    cache: dict[bool, object] = {}
    aot_mem: dict[str, object] = {}

    def _trace_clean() -> bool:
        from jax._src import core as _core

        try:
            return bool(_core.trace_state_clean())
        except Exception:
            return True

    def _jitted(top: bool):
        f = cache.get(top)
        if f is None:
            kw = dict(jit_kwargs)
            if top and _cpu_backend():
                kw.setdefault("compiler_options", _CPU_OPTS)
            f = cache[top] = jax.jit(fun, **kw)
        return f

    _UNEXPORTABLE = object()

    def _dynamic(args, kwargs):
        """Strip static args/kwargs: ``jax.export`` bakes them into the
        artifact, and the exported call signature carries only dynamics."""
        statics = jit_kwargs.get("static_argnums", ())
        if isinstance(statics, int):
            statics = (statics,)
        names = jit_kwargs.get("static_argnames", ())
        if isinstance(names, str):
            names = (names,)
        dargs = tuple(a for i, a in enumerate(args) if i not in statics)
        dkw = {k: v for k, v in kwargs.items() if k not in names}
        return dargs, dkw

    def _aot_call(args, kwargs):
        """Top-level call through the AOT cache; returns (handled, result)."""
        key = _aot_key(fun, jit_kwargs, args, kwargs)
        exp = aot_mem.get(key)
        if exp is _UNEXPORTABLE:
            return False, None
        if exp is None:
            from jax import export as jex

            path = os.path.join(
                _aot_dir(), f"{fun.__qualname__}-{key}.jexp"
            )
            if os.path.exists(path):
                try:
                    with open(path, "rb") as f:
                        exp = jex.deserialize(bytearray(f.read()))
                except Exception:
                    exp = None
            if exp is None:
                import time as _time

                t0 = _time.perf_counter()
                try:
                    exp = jex.export(_jitted(True))(*args, **kwargs)
                    blob = exp.serialize()
                except Exception:
                    aot_mem[key] = _UNEXPORTABLE
                    return False, None
                if os.environ.get("HALO2_RSA_AOT_LOG"):
                    import sys as _sys

                    print(
                        f"[aot] export {fun.__qualname__} {key} "
                        f"{_time.perf_counter() - t0:.2f}s {len(blob)}B",
                        file=_sys.stderr,
                        flush=True,
                    )
                tmp = f"{path}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(bytes(blob))
                os.replace(tmp, path)
            aot_mem[key] = exp
        dargs, dkw = _dynamic(args, kwargs)
        return True, exp.call(*dargs, **dkw)

    @functools.wraps(fun)
    def wrapper(*args, **kwargs):
        # compiler_options is only legal on a TOP-LEVEL jit; when this
        # wrapper is invoked inside another trace the jit is inlined and
        # the outermost jit's options govern.
        top = _trace_clean()
        if top and _aot_dir() is not None:
            handled, res = _aot_call(args, kwargs)
            if handled:
                return res
        return _jitted(top)(*args, **kwargs)

    def _clear():
        cache.clear()
        aot_mem.clear()
        _cpu_backend.cache_clear()
        _aot_dir.cache_clear()

    wrapper._clear_cache = _clear
    return wrapper
