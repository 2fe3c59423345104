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
    """Set JAX_COMPILATION_CACHE_DIR (if unset) to a per-user location and
    return the effective value.  Respects an existing env setting."""
    if path is None:
        base = os.environ.get("XDG_CACHE_HOME",
                              os.path.join(os.path.expanduser("~"), ".cache"))
        path = os.path.join(base, "vb_jax")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
