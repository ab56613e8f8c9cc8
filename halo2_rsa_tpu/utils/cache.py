"""Persistent XLA compile-cache activation.

The ambient environment imports jax at interpreter startup (sitecustomize),
so JAX_COMPILATION_CACHE_DIR set by a script's own code arrives too late —
jax has already read its env config. ``jax.config.update`` works at any
point before the first compilation, so scripts call this helper instead.

keygen + cold prove of the flagship are ~200-240 s of compilation each; the
cache turns driver/bench re-runs into warm starts.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    if path is None:
        path = os.environ.get(
            "HALO2_RSA_TPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", path)
    # Default floor (1 s) excludes the ~0.45 s-each eager-op executables
    # (concatenate/broadcast/dynamic_slice between jitted prover stages);
    # a fresh process replays ~100 of them — measured 45-60 s of the cold
    # prove. Persist everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
