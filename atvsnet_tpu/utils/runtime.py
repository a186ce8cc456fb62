"""Process-level JAX runtime setup shared by CLIs and bench.

TPU compiles of the full pipeline take 1-8 minutes per (shape, dtype) bucket on this
platform; the persistent compilation cache turns every repeat invocation into a
sub-second deserialization.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/atvsnet_tpu/xla")


def setup_jax(compilation_cache_dir: str | None = None) -> None:
    import jax

    cache = compilation_cache_dir or os.environ.get("ATVSNET_XLA_CACHE", _DEFAULT_CACHE)
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older/newer jax without these knobs
        pass
