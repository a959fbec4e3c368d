"""Persistent XLA compile-cache wiring.

The reference pays no compile cost (eager torch); under jit the first
compile of the full eval/train graph is multi-minute, so every entry
point (CLIs, bench.py, the multi-chip dryrun, tests) shares one on-disk
cache: repeated runs — including a user's second eval of the same config
— start computing in seconds.  Override the location with
``SLOTVPS_COMPILE_CACHE`` (default /tmp/jax_cache_slotvps)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("SLOTVPS_COMPILE_CACHE",
                                  "/tmp/jax_cache_slotvps")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without the knobs — run uncached
        pass
