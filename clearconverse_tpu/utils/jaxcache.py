"""Persistent XLA compilation cache setup.

First compile of each program shape over the tunnel-attached device takes
30 s - minutes; without the persistent cache EVERY fresh process (server
start, eval run, worker) pays all of them again — a cold dev-mode server
was measured at ~9 min to first transcript vs seconds warm. bench.py and
__graft_entry__ set this up inline; every other entry point calls here.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/cc_tpu_jax_cache"


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotent; safe before or after backend init. An unwritable cache
    dir degrades to no cache (warn) rather than failing the entry point."""
    import logging

    import jax

    path = os.path.expanduser(
        cache_dir or os.environ.get("CC_TPU_COMPILE_CACHE", _DEFAULT_DIR))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as exc:
        logging.getLogger(__name__).warning(
            "compile cache dir %s unavailable (%s); running without the "
            "persistent cache", path, exc)
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
