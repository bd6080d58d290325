"""Top-k with a deterministic, reference-compatible ordering.

The reference ranks with ``scores.argsort()[::-1]``
(``src/easyrag/custom/retrievers.py:192``). numpy's default argsort is an
*unstable* introsort, so the reference's ordering among exactly-tied scores
is an arbitrary (if deterministic) permutation — not reproducible by any
stable rule, on any backend. Our parity guarantee is therefore: identical
ordering for all distinct scores, and a *deterministic* tie policy — ties
ordered by descending doc index, i.e. exactly ``argsort(kind="stable")[::-1]``.

``jax.lax.top_k`` breaks ties by ascending index, so we run it over the
flipped array and map indices back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_desc_reference_order(scores: jnp.ndarray, k: int):
    """Return ``(values, indices)`` of the top-k scores, descending, ties by
    descending index. ``scores`` is rank-1 or batched rank-2 (top-k on the
    last axis)."""
    n = scores.shape[-1]
    k = min(k, n)
    rev = jnp.flip(scores, axis=-1)
    vals, rev_idx = jax.lax.top_k(rev, k)
    return vals, (n - 1) - rev_idx
