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

# chunked two-stage path: preferred chunk counts (first divisor of n wins)
_CHUNK_CHOICES = (16, 10, 8, 5, 4, 2)


def _pick_chunks(n: int, k: int) -> int:
    """Chunk count for the two-stage path, or 1 to use single-stage.

    ``lax.top_k`` over a [B, n] row costs ~O(n·k) on TPU; splitting the row
    into C chunks does C small top-ks (still n·k work but on shorter rows
    that tile better) and a tiny candidate merge — measured 13% faster for
    the dense route at n=20k, k=288 (65.0 -> 57.3 ms for a 1024-query
    stream). Only worth it when chunks comfortably exceed k; only exact
    when chunks divide n (no pad entries that could surface on all--inf
    rows), so fall back to 1 otherwise.
    """
    if n < 4096:
        return 1
    for c in _CHUNK_CHOICES:
        if n % c == 0 and n // c >= 2 * k:
            return c
    return 1


def topk_desc_reference_order(scores: jnp.ndarray, k: int):
    """Return ``(values, indices)`` of the top-k scores, descending, ties by
    descending index. ``scores`` is rank-1 or batched rank-2 (top-k on the
    last axis). Large rows take a two-stage path (per-chunk top-k, then a
    lexicographic candidate merge) with bit-identical results."""
    n = scores.shape[-1]
    k = min(k, n)
    chunks = _pick_chunks(n, k)
    if chunks == 1:
        rev = jnp.flip(scores, axis=-1)
        vals, rev_idx = jax.lax.top_k(rev, k)
        return vals, (n - 1) - rev_idx
    batch_shape = scores.shape[:-1]
    w = n // chunks
    sc = scores.reshape(*batch_shape, chunks, w)
    # stage 1 — per-chunk top-k with the same flip trick: selection keeps
    # the LARGEST-index ties (the policy), each chunk ordered (v desc, idx
    # desc). Any global top-k element is necessarily in its chunk's top-k.
    rev = jnp.flip(sc, axis=-1)
    v1, rev_i1 = jax.lax.top_k(rev, k)
    base = (jnp.arange(chunks, dtype=jnp.int32) * w)[..., None]
    i1 = base + (w - 1) - rev_i1  # global doc indices
    flat_v = v1.reshape(*batch_shape, chunks * k)
    flat_i = i1.reshape(*batch_shape, chunks * k)
    # stage 2 — exact lexicographic merge of the C*k candidates: ascending
    # sort on (-value, -index) == descending value, ties descending index.
    # (A second flip-trick would order within-chunk ties backwards: stage-1
    # blocks list ties descending, so "later in flat" != "larger index".)
    neg_v, neg_i = jax.lax.sort(
        (-flat_v, -flat_i), dimension=-1, num_keys=2
    )
    return -neg_v[..., :k], -neg_i[..., :k]
