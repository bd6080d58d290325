"""Utilities: config IO, event hooks, structured logging, profiling."""

import asyncio
from typing import Any, Dict

import yaml


def run_sync(coro):
    """Run a coroutine to completion from synchronous code.

    ``asyncio.get_event_loop()`` raises on Python 3.12 once the thread's
    loop has been consumed (e.g. by a prior ``asyncio.run`` anywhere in
    the process); keep a thread-local loop alive instead — the sync
    ``complete``/``retrieve`` wrappers are called repeatedly and their
    objects create all async state fresh per call, so loop reuse is safe.
    """
    try:
        loop = asyncio.get_event_loop()
    except RuntimeError:
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
    if loop.is_closed():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
    return loop.run_until_complete(coro)


def get_yaml_data(path: str) -> Dict[str, Any]:
    """YAML -> dict (``src/easyrag/utils/__init__.py:4-9``)."""
    with open(path, "r", encoding="utf-8") as f:
        return yaml.full_load(f)
