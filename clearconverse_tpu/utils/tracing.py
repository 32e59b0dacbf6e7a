"""Per-stage tracing + device profiling.

The reference has no tracing at all (SURVEY.md §5.1 — only a wall-clock
``elapsed_seconds``). This module provides:

  * ``StageTimer`` — labeled wall-clock spans; the engine times every
    pipeline stage and attaches the table to result metadata, and the
    serve layer logs it per task,
  * ``device_trace`` — context manager around ``jax.profiler`` traces
    (TensorBoard format) for kernel-level inspection on TPU,
  * sync helper that actually blocks on the axon tunnel platform (where
    ``block_until_ready`` is a no-op — measured; see bench.py).
"""

from __future__ import annotations

import contextlib
import logging
import time
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


@lru_cache(maxsize=1)
def _first_elem_fn():
    import jax

    return jax.jit(lambda a: a.reshape(-1)[:1])


def force_sync(x) -> None:
    """Reliable execution barrier: fetch ONE element of the first leaf,
    sliced ON DEVICE first. (On the axon tunnel platform block_until_ready
    returns immediately — and ``np.asarray(leaf)`` would transfer AND
    host-cache the whole buffer, serializing the very download that
    callers overlap afterwards; measured: the 15 MB gated batch rode
    inside the upload_gate span and the async download thread just re-read
    the cached value.) The device slice is a trivial jitted program cached
    per (shape, dtype); its output materializing proves every producer of
    the leaf finished."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(x)
    if not leaves:
        return
    leaf = leaves[0]
    if isinstance(leaf, jax.Array):
        np.asarray(_first_elem_fn()(leaf))
    else:
        np.asarray(leaf)


class StageTimer:
    """Accumulates labeled spans; nested use via the context manager.

    ``totals_only=True`` keeps running per-key totals instead of the
    append-only span list — for long-lived timers (ModelBundle records a
    span per device call for the life of the process; a span list would
    grow unboundedly and make every as_dict() O(all spans ever))."""

    def __init__(self, totals_only: bool = False):
        self.spans: List[Tuple[str, float]] = []
        self._totals: Optional[Dict[str, float]] = {} if totals_only else None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if self._totals is not None:
                self._totals[name] = self._totals.get(name, 0.0) + dt
            else:
                self.spans.append((name, dt))

    def as_dict(self) -> Dict[str, float]:
        if self._totals is not None:
            return dict(self._totals)
        out: Dict[str, float] = {}
        for name, dt in self.spans:
            out[name] = out.get(name, 0.0) + dt
        return out

    def summary(self) -> str:
        items = (self.spans if self._totals is None
                 else list(self._totals.items()))
        total = sum(dt for _, dt in items)
        parts = [f"{name}={dt:.2f}s" for name, dt in items]
        return f"total={total:.2f}s " + " ".join(parts)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)
