"""ICI-sharded index query: per-shard scoring + local top-k + all-gather merge.

The query path the scaling book prescribes, applied to retrieval:

* the corpus axis (docs) is sharded over the mesh's "data" axis — the dense
  embedding matrix by rows, the sparse score vector by doc ranges;
* the query is replicated;
* each shard computes local scores and a *local* top-k (k candidates per
  shard, not the full score vector) — so the ICI all-gather moves
  ``devices × k`` candidates instead of ``N`` scores;
* a replicated global top-k over the gathered candidates finishes the job.

Index offsets are recovered from ``jax.lax.axis_index``. Results are
bit-identical to the single-chip path for distinct scores; tie ordering
follows the same deterministic descending-index policy (global doc index).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops.topk import topk_desc_reference_order

NEG_INF = jnp.float32(-jnp.inf)


def _merge_global_topk(local_vals, local_idx, axis: str, k: int):
    """all-gather per-shard candidates and take a replicated global top-k.

    local_vals/local_idx: [B, k] per shard with *global* doc indices.
    """
    vals = jax.lax.all_gather(local_vals, axis, axis=0)  # [D, B, k]
    idx = jax.lax.all_gather(local_idx, axis, axis=0)
    d, b, kk = vals.shape
    vals = jnp.moveaxis(vals, 0, 1).reshape(b, d * kk)
    idx = jnp.moveaxis(idx, 0, 1).reshape(b, d * kk)
    # global tie policy = descending doc index: order candidates by index
    # descending so positional ties resolve identically to single-chip
    order = jnp.argsort(-idx, axis=1)
    vals = jnp.take_along_axis(vals, order, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    top_vals, pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idx, pos, axis=1)


class ShardedDenseIndex:
    """Row-sharded HBM cosine index over a mesh "data" axis."""

    def __init__(self, mesh: Mesh, matrix: np.ndarray, dtype=jnp.bfloat16) -> None:
        self.mesh = mesh
        n_shards = mesh.shape["data"]
        n, d = matrix.shape
        self.num_docs = n
        self.pad_n = ((n + n_shards - 1) // n_shards) * n_shards
        padded = np.zeros((self.pad_n, d), dtype=np.float32)
        padded[:n] = matrix
        sharding = NamedSharding(mesh, P("data", None))
        self.matrix = jax.device_put(jnp.asarray(padded, dtype=dtype), sharding)
        self.shard_size = self.pad_n // n_shards

    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _query(self, q: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mesh = self.mesh
        shard_size = self.shard_size
        num_docs = self.num_docs

        def shard_fn(matrix_local, q_rep):
            lo = jax.lax.axis_index("data") * shard_size
            scores = jax.lax.dot_general(
                q_rep.astype(matrix_local.dtype),
                matrix_local,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, shard]
            # mask padded rows
            local_ids = lo + jax.lax.broadcasted_iota(
                jnp.int32, (1, shard_size), 1
            )
            scores = jnp.where(local_ids < num_docs, scores, NEG_INF)
            lv, li = topk_desc_reference_order(scores, min(k, shard_size))
            return _merge_global_topk(lv, li + lo, "data", k)

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("data", None), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )(self.matrix, q)

    def query(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = np.atleast_2d(np.asarray(q, dtype=np.float32))
        vals, idx = self._query(jnp.asarray(q), k)
        return np.asarray(vals), np.asarray(idx)


class ShardedSparseScorer:
    """Doc-range-sharded BM25 scoring.

    The gathered postings buffer is replicated (it is small: ≤ a few 100KB
    per query batch); each shard scatter-adds only the postings whose doc id
    falls in its range, producing its slice of the score vector, then local
    top-k + global merge as in the dense path.
    """

    def __init__(self, mesh: Mesh, num_docs: int) -> None:
        self.mesh = mesh
        self.num_docs = num_docs
        n_shards = mesh.shape["data"]
        self.shard_size = ((num_docs + n_shards - 1) // n_shards)

    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _score_topk(
        self, doc_ids: jnp.ndarray, vals: jnp.ndarray, k: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        shard_size = self.shard_size
        num_docs = self.num_docs

        def shard_fn(ids_rep, vals_rep):
            lo = jax.lax.axis_index("data") * shard_size
            local = ids_rep - lo  # out-of-range -> dropped by scatter
            def scatter_one(ids_1d, vals_1d):
                z = jnp.zeros((shard_size,), jnp.float32)
                return z.at[local_clip(ids_1d)].add(
                    jnp.where(in_range(ids_1d), vals_1d, 0.0), mode="drop"
                )

            def in_range(ids_1d):
                return (ids_1d >= 0) & (ids_1d < shard_size)

            def local_clip(ids_1d):
                return jnp.where(in_range(ids_1d), ids_1d, shard_size)

            scores = jax.vmap(scatter_one)(local, vals_rep)  # [B, shard]
            local_ids = lo + jax.lax.broadcasted_iota(jnp.int32, (1, shard_size), 1)
            scores = jnp.where(local_ids < num_docs, scores, NEG_INF)
            scores = jnp.where(scores > 0, scores, NEG_INF)
            lv, li = topk_desc_reference_order(scores, min(k, shard_size))
            return _merge_global_topk(lv, li + lo, "data", k)

        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(None, None), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )(doc_ids, vals)

    def score_topk(
        self, doc_ids: np.ndarray, vals: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        doc_ids = np.atleast_2d(doc_ids)
        vals = np.atleast_2d(vals)
        tv, ti = self._score_topk(jnp.asarray(doc_ids), jnp.asarray(vals), k)
        return np.asarray(tv), np.asarray(ti)
