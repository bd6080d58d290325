"""Pallas BM25 scatter kernel: one-hot matmul accumulation per doc tile.

The gathered postings ``(doc_ids[P], vals[P])`` must be summed into a dense
score vector ``scores[N]``. A serial scatter is hostile to the TPU's vector
memory, so the kernel instead processes the score vector in tiles of
``TILE`` docs: for each tile it streams the postings in blocks of ``BLK``
and accumulates

    acc[j] += sum_p vals[p] * (doc_ids[p] == tile_start + j)

i.e. a ``[1, BLK] @ [BLK, TILE]`` one-hot matmul that runs on the MXU with
f32 accumulation — numerically exact because each posting contributes to
exactly one column. Padding postings carry ``doc_id == num_docs`` and
``val == 0`` so they add nothing even when the sentinel lands inside the
padded tail of the tile range.

This replaces the per-query Python loop of rank_bm25
(``src/easyrag/custom/retrievers.py:113-151``) as the sparse-route hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # docs per output tile (lane-dim multiple of 128)
BLK = 512  # postings per inner block


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ids_ref, vals_ref, out_ref):
    tile_start = pl.program_id(0) * TILE
    p_total = ids_ref.shape[1]
    num_blocks = p_total // BLK
    cols = tile_start + jax.lax.broadcasted_iota(jnp.int32, (BLK, TILE), 1)

    def body(b, acc):
        ids_blk = ids_ref[0, pl.ds(b * BLK, BLK)]  # [BLK]
        vals_blk = vals_ref[:, pl.ds(b * BLK, BLK)]  # [1, BLK]
        onehot = (ids_blk[:, None] == cols).astype(jnp.float32)  # [BLK, TILE]
        # HIGHEST: the MXU natively multiplies bf16; default precision would
        # truncate the f32 score values (measured ~0.4% error) and could
        # reorder near-ties vs the reference ranking
        return acc + jnp.dot(
            vals_blk,
            onehot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jax.lax.fori_loop(0, num_blocks, body, jnp.zeros((1, TILE), jnp.float32))
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("num_docs", "interpret"))
def _scores_single(doc_ids, vals, num_docs: int, interpret: bool = False):
    p = doc_ids.shape[0]
    p_pad = _round_up(max(p, BLK), BLK)
    n_pad = _round_up(max(num_docs, TILE), TILE)
    ids2 = jnp.full((1, p_pad), num_docs, dtype=jnp.int32).at[0, :p].set(doc_ids)
    vals2 = jnp.zeros((1, p_pad), dtype=jnp.float32).at[0, :p].set(vals)
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((1, p_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad,
            bytes_accessed=8 * p_pad * (n_pad // TILE) + 4 * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids2, vals2)
    return out[0, :num_docs]


def bm25_scores_pallas(doc_ids, vals, num_docs: int, interpret: bool = False):
    """Dense BM25 scores from gathered postings; ``[P]`` or batched ``[B, P]``."""
    fn = functools.partial(_scores_single, num_docs=num_docs, interpret=interpret)
    if doc_ids.ndim == 2:
        return jax.vmap(fn)(doc_ids, vals)
    return fn(doc_ids, vals)
