"""Shared misc utilities (parity: ``model/model_utils.py``, ``utils/file_utils.py``).

``requires_grad`` is a structural no-op in JAX (params are data, gradients are
taken explicitly); it exists so task-model code keeps the reference shape.
"""

from __future__ import annotations

import os

MAX_SAMPLE_SIZE = 4096  # parity: model/model_utils.py:1


def requires_grad(model, flag: bool = True) -> None:
    """No-op under JAX's functional parameter model (model_utils.py:4-7)."""
    return None


def enable_compilation_cache(min_compile_secs: float = 5.0) -> str | None:
    """Turn on JAX's persistent compilation cache (measured on this image's
    tunneled TPU runtime: a 255 s remote compile replays in ~10 s from a
    warm cache).  Call before the first jit executes.

    Directory: $CYCLEDIFFUSION_COMPILE_CACHE (default ``~/.jax_cache``);
    set CYCLEDIFFUSION_NO_COMPILE_CACHE=1 to disable.  Only programs whose
    compile exceeds ``min_compile_secs`` are persisted, keeping the cache
    to the expensive chain/UNet programs.
    """
    if os.environ.get("CYCLEDIFFUSION_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    path = os.path.expanduser(
        os.environ.get("CYCLEDIFFUSION_COMPILE_CACHE", "~/.jax_cache"))
    try:
        # TPU-only: that's where compiles cost minutes; XLA:CPU cache
        # entries are AOT machine code that can mismatch the host
        # (observed "+prefer-no-gather not supported ... SIGILL" warning)
        if jax.default_backend() != "tpu":
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:  # noqa: BLE001 — the cache is an optimization only
        return None
    return path
