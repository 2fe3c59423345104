"""Persistent XLA compilation-cache default, shared by bench/example scripts.

The lattice window programs compile in ~250 s cold / ~35 s warm on the
remote TPU worker, so every entry-point script wants a persistent on-disk
cache.  A fixed /tmp path collides across users on a shared host (a cache
directory created by another user may be unwritable, silently disabling
caching — round-4 advisor finding), so the default lives under the invoking
user's cache directory.

Import this module BEFORE jax (it imports nothing heavy itself):

    from voicebridge_tpu.utils.jax_cache import setdefault_compilation_cache
    setdefault_compilation_cache()
"""

from __future__ import annotations

import os


def setdefault_compilation_cache(path: str | None = None) -> str:
    """Set JAX's compilation cache dir (if unset) to a per-user location and
    return the effective value.  Respects an existing env setting.

    The env var alone is NOT enough when something imported jax before this
    runs — the axon environment's sitecustomize does exactly that at
    interpreter startup, which left every round-5 entry point compiling
    cold (the cache dir was never even created).  So when jax is already
    importable the setting is also pushed through jax.config, which takes
    effect for all later compiles."""
    if path is None:
        base = os.environ.get("XDG_CACHE_HOME",
                              os.path.join(os.path.expanduser("~"), ".cache"))
        path = os.path.join(base, "vb_jax")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    eff = os.environ["JAX_COMPILATION_CACHE_DIR"]
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", eff)
        # the default min-entry-size setting skips caching small programs;
        # the decode path is built from many medium window programs, so
        # cache everything (cache misses cost minutes on the remote worker)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return eff
