"""Device-side BM25 query scoring.

The host gathers the query's posting slices into static-shape buffers
(``SparseIndex.gather_postings``); the device turns them into a dense score
vector and a filtered top-k. Two implementations:

* :func:`bm25_scores` — XLA scatter-add (works on every backend, used as the
  correctness reference and for interpret-mode tests).
* :func:`bm25_scores_pallas` (``ops/bm25_pallas.py``) — a Pallas kernel that
  rewrites the scatter as a one-hot matmul per doc tile so the accumulation
  runs on the MXU instead of serialized vector stores.

Padding convention: ``doc_ids == num_docs`` marks padding; the scatter drops
out-of-range indices (``mode="drop"``), and the Pallas kernel's tile mask
never matches the sentinel.

Replicated reference semantics for the top-k filter
(``src/easyrag/custom/retrievers.py:191-210``):
  * rank by ``argsort()[::-1]`` order (ties by descending doc index)
  * entries with ``score <= 0`` are dropped
  * optional metadata equality filter (the ``dir`` column) drops non-matching
    docs *without* consuming top-k slots.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .topk import topk_desc_reference_order

NEG_INF = float("-inf")  # host constant: a jnp scalar here would initialize
# the XLA backend at import time, breaking jax.distributed.initialize ordering


def pack_postings(doc_ids, vals):
    """Pack gathered postings into ONE int32 array ``[B, 2, P]`` (vals
    bitcast) so a query batch costs a single host->device transfer — on a
    remote-attached TPU each transfer is a round trip."""
    import numpy as np

    ids = np.atleast_2d(doc_ids).astype(np.int32)
    v = np.atleast_2d(vals).astype(np.float32)
    return np.stack([ids, v.view(np.int32)], axis=1)


def unpack_postings(packed: jnp.ndarray):
    ids = packed[:, 0, :]
    vals = jax.lax.bitcast_convert_type(packed[:, 1, :], jnp.float32)
    return ids, vals


def bm25_scores(doc_ids: jnp.ndarray, vals: jnp.ndarray, num_docs: int) -> jnp.ndarray:
    """Dense score vector from gathered postings via scatter-add.

    ``doc_ids``/``vals`` may be rank-1 ``[P]`` or batched ``[B, P]``.
    """
    if doc_ids.ndim == 2:
        return jax.vmap(lambda d, v: bm25_scores(d, v, num_docs))(doc_ids, vals)
    scores = jnp.zeros((num_docs,), dtype=jnp.float32)
    return scores.at[doc_ids].add(vals, mode="drop")


@functools.partial(jax.jit, static_argnames=("num_docs", "k", "use_pallas"))
def bm25_score_topk(
    doc_ids: jnp.ndarray,
    vals: jnp.ndarray,
    num_docs: int,
    k: int,
    dir_col: Optional[jnp.ndarray] = None,
    dir_filter: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score + filter + top-k in one jitted step.

    Args:
      doc_ids, vals: gathered postings, ``[P]`` or ``[B, P]``.
      num_docs: corpus size N.
      k: top-k size.
      dir_col: optional ``[N]`` int32 metadata column.
      dir_filter: optional scalar (or ``[B]``) int32; -1 disables filtering.
      use_pallas: route the scatter through the Pallas one-hot-matmul kernel.

    Returns:
      (scores[k], indices[k]) (batched if inputs are batched). Dropped
      entries (score <= 0 after filtering, or filtered out) appear with
      score ``-inf`` and index ``num_docs``; callers truncate on the first
      ``-inf`` — ordering up to that point matches the reference exactly.
    """
    if vals is None:  # packed single-transfer form [B, 2, P]
        doc_ids, vals = unpack_postings(doc_ids)
    if use_pallas:
        from .bm25_pallas import bm25_scores_pallas

        scores = bm25_scores_pallas(doc_ids, vals, num_docs)
    else:
        scores = bm25_scores(doc_ids, vals, num_docs)

    # filter + top-k run natively batched: vmapping a per-row top_k lowers
    # to a serialized form on TPU (~100x slower, measured), while 2-D
    # lax.top_k over the trailing axis is fast
    batched = scores.ndim == 2
    s = scores if batched else scores[None, :]
    if dir_col is not None and dir_filter is not None:
        dir_f = jnp.atleast_1d(dir_filter)
        # -1 disables filtering; -2 (unknown dir) matches nothing
        keep = jnp.logical_or(dir_f[:, None] == -1, dir_col[None, :] == dir_f[:, None])
        s = jnp.where(keep, s, NEG_INF)
    # reference drops score <= 0 (retrievers.py:195-196)
    s = jnp.where(s > 0, s, NEG_INF)
    top_vals, top_idx = topk_desc_reference_order(s, k)
    top_idx = jnp.where(jnp.isfinite(top_vals), top_idx, num_docs)
    if not batched:
        return top_vals[0], top_idx[0]
    return top_vals, top_idx
