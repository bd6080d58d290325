"""Persistent XLA executable cache — kills the cold-compile tail.

On a remote-attached TPU (the axon tunnel), every 7B-scale graph compile
goes through a remote-compile helper and costs minutes to tens of minutes;
the helper does NOT cache across processes, so every boot of the serving
stack or a bench tool re-pays the full compile bill (measured: a single
cold (bucket, B) decode executable at 7B ≈ 10-12 min, and one landing
inside a timed window produced a 718 s p95). JAX's persistent compilation
cache serializes the compiled executable to disk keyed by (HLO,
compile options, topology) — verified to round-trip through the axon
backend — so the second process pays a disk read instead.

The reference has no equivalent concern (torch eager, no AOT compiles);
this is TPU-deployment infrastructure. Enabled by every bench tool, by
``bench.py``, and by the serving boot when ``tpu.compile_cache_dir`` is
set (``configs/easyrag.yaml``).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``, overridable via ``EASYRAG_COMPILE_CACHE``).

    Must run before the compiles it should capture; safe to call multiple
    times. Thresholds are zeroed so even mid-sized executables persist —
    on the remote attachment *every* compile is worth caching.
    """
    import jax

    path = path or os.environ.get("EASYRAG_COMPILE_CACHE") or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
