"""Shared JAX runtime configuration.

Call `ensure_compile_cache()` before building any sizable jitted
program: it points JAX's persistent compilation cache at a repo-local
directory so CLI invocations and tests don't re-pay multi-second XLA
compiles for the packaged kernels (decode/projection, device ICP).
Safe to call repeatedly and before/after backend init.
"""

from __future__ import annotations

import os

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        cache = os.environ.get(
            "OUSTER_SDK_TPU_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
