"""Event-hook seam + profiling.

The reference's only instrumentation is llama-index CallbackManager events
around chunking, node parsing, and reranking (SURVEY.md §5). We keep the
same seam as a process-global hook registry: components ``emit(kind,
payload)``, listeners subscribe with :func:`on`. Additionally
:func:`trace` wraps a block in a ``jax.profiler`` trace when a trace dir is
configured (``EASYRAG_TRACE_DIR``), giving TPU timeline visibility the
reference never had.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Any, Callable, Dict, List

logger = logging.getLogger("easyrag_tpu")

_listeners: List[Callable[[str, Dict[str, Any]], None]] = []


def on(listener: Callable[[str, Dict[str, Any]], None]) -> Callable[[], None]:
    """Subscribe to events; returns an unsubscribe callable."""
    _listeners.append(listener)
    return lambda: _listeners.remove(listener)


def emit(kind: str, payload: Dict[str, Any]) -> None:
    logger.debug("event %s %s", kind, payload)
    for listener in list(_listeners):
        try:
            listener(kind, payload)
        except Exception:  # pragma: no cover - listeners must not break flow
            logger.exception("event listener failed for %s", kind)


@contextlib.contextmanager
def trace(name: str):
    """Time a block; export a jax profiler trace when EASYRAG_TRACE_DIR is
    set."""
    trace_dir = os.environ.get("EASYRAG_TRACE_DIR")
    start = time.perf_counter()
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
    emit("timing", {"name": name, "seconds": time.perf_counter() - start})
