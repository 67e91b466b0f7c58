"""Persistent XLA compilation cache for the CLI / bench entry points.

The TPU programs here compile slowly (a config-3 wavefront band is
~30-45 s of Mosaic + XLA; a full-frame cold run ~2-3 minutes), and the
round driver, the CLI and the bench all start fresh processes.  JAX's
persistent compilation cache works through the axon remote-compile
relay — measured: an 11.4 s cold kernel compile returns in 0.9 s from a
fresh process — so entry points opt in by default.

Library imports do NOT enable it (a library must not write to the
filesystem on import); only `python -m stereo_matchin_tpu` and
`bench.py` call this.  Opt out with STEREO_TPU_NO_COMPILE_CACHE=1 or
point STEREO_TPU_COMPILE_CACHE at a different directory.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the directory
    used, or None when disabled/unavailable.  Safe to call repeatedly."""
    if os.environ.get("STEREO_TPU_NO_COMPILE_CACHE"):
        return None
    path = (path or os.environ.get("STEREO_TPU_COMPILE_CACHE")
            or os.path.expanduser("~/.cache/stereo_matchin_tpu/xla"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Default threshold skips sub-second programs; lower it so the
        # many mid-sized pipeline programs (1-60 s compiles) all cache.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimisation, never fatal
        return None
    return path
