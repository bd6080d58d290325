"""Dense (flat cosine) index: the qdrant replacement.

The reference stores 3584-d GTE embeddings in an external qdrant server and
queries it over HTTP (``src/easyrag/pipeline/ingestion.py:155-191``,
``src/easyrag/custom/retrievers.py:37-52``). Here the corpus embedding
matrix is an HBM-resident, L2-normalized ``[N, D]`` array; a query is one
fused jitted step: ``scores = q @ E^T`` (bf16 on the MXU, f32 accumulation)
followed by top-k. Cosine distance == dot product because both sides are
normalized at build time, matching qdrant's COSINE behavior (qdrant
normalizes vectors on upsert).

Kernel-choice note (benchmarked, see BASELINE.md): the fused-by-XLA
matmul+top_k path is the deliberate design. Materializing ``[B, N]`` f32
scores is negligible next to streaming the ``[N, D]`` matrix (D=3584 ≫ 1),
and a hand-written Pallas fusion is not currently expressible anyway —
``lax.top_k`` has no Mosaic lowering (verified: ``NotImplementedError:
Unimplemented primitive ... top_k``), and an exact in-kernel selection
needs per-tile capacity ≥ k (= 288 iterative max passes). The Pallas
budget goes where it pays: the BM25 scatter kernel and flash attention.

Metadata filtering replicates the qdrant ``dir`` must-match filter
(``ingestion.py:207-216``) as a score mask before top-k.
"""

from __future__ import annotations

import functools
import json
import os
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import topk_desc_reference_order

NEG_INF = float("-inf")  # host constant: a jnp scalar here would initialize
# the XLA backend at import time, breaking jax.distributed.initialize ordering


@functools.partial(jax.jit, static_argnames=("k",))
def dense_score_topk(
    query: jnp.ndarray,  # [B, D] (normalized)
    matrix: jnp.ndarray,  # [N, D] (normalized: bf16/f32, or int8 w/ scales)
    k: int,
    dir_col: Optional[jnp.ndarray] = None,  # [N] int32
    dir_filter: Optional[jnp.ndarray] = None,  # [B] int32, -1 = no filter
    scales: Optional[jnp.ndarray] = None,  # [N] f32 per-row int8 scales
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused cosine scoring + filtered top-k. Returns (scores[B,k], idx[B,k]).

    int8 path: the corpus matrix is symmetric-quantized per row
    (``row_f32 ≈ row_int8 * scale``); queries are quantized on the fly and
    the int8×int8 matmul accumulates in int32 on the MXU (2x the bf16 rate,
    4x the HBM headroom), then rescales to f32 scores.
    """
    if matrix.dtype == jnp.int8:
        q_scale = jnp.max(jnp.abs(query), axis=1, keepdims=True) / 127.0
        q8 = jnp.clip(
            jnp.round(query / jnp.maximum(q_scale, 1e-12)), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q8,
            matrix,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, N] int32
        scores = acc.astype(jnp.float32) * q_scale * scales[None, :]
    else:
        scores = jax.lax.dot_general(
            query.astype(matrix.dtype),
            matrix,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, N]
    if dir_col is not None and dir_filter is not None:
        # -1 disables filtering; -2 (unknown dir) matches nothing, matching
        # qdrant's must-match semantics for a value absent from the corpus
        keep = jnp.logical_or(
            dir_filter[:, None] == -1, dir_col[None, :] == dir_filter[:, None]
        )
        scores = jnp.where(keep, scores, NEG_INF)
    tv, ti = topk_desc_reference_order(scores, k)
    # sentinel contract (same as the sparse path): -inf entries carry the
    # out-of-range index N, never a doc id — consumers stop at the first
    # non-finite score, and the sharded index can match this exactly
    # (its HBM padding rows would otherwise leak pad indices into ties)
    return tv, jnp.where(jnp.isfinite(tv), ti, matrix.shape[0])


@functools.partial(jax.jit, static_argnames=("k",))
def dense_score_topk_stream(
    query: jnp.ndarray,  # [NB, B, D] (normalized query batches)
    matrix: jnp.ndarray,
    k: int,
    dir_col: Optional[jnp.ndarray] = None,
    dir_filter: Optional[jnp.ndarray] = None,  # [NB, B] int32
    scales: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Whole query stream in one compiled dispatch (batches lax.scan-ed on
    device) — the dense mirror of the sparse stream scorer; removes the
    per-batch host round trip that dominates batch eval on remote-attached
    chips. Returns stacked ``(scores [NB,B,k], idx [NB,B,k], checksum)``;
    the checksum is the 4-byte completion barrier."""

    def step(_, inp):
        q, *df = inp
        tv, ti = dense_score_topk(
            q, matrix, k, dir_col=dir_col,
            dir_filter=df[0] if df else None, scales=scales,
        )
        return 0, (tv, ti)

    xs = (query,) if dir_filter is None else (query, dir_filter)
    _, (tvs, tis) = jax.lax.scan(step, 0, xs)
    return tvs, tis, tis.sum()


def prepare_dense_arrays(
    embeddings: np.ndarray,
    dirs: Optional[list] = None,
    dtype: str = "bfloat16",
):
    """Host-side index preparation shared by the single-chip and sharded
    builds: normalize rows, assign dir ids, optionally int8-quantize.
    Returns ``(matrix, scales_or_None, dir_ids_or_None, dir_vocab)`` as
    HOST numpy arrays (int8 matrix + f32 scales when ``dtype == "int8"``,
    else the normalized f32 matrix — the caller casts)."""
    mat = l2_normalize(np.asarray(embeddings, dtype=np.float32))
    dir_ids = None
    dir_vocab: Dict[str, int] = {}
    if dirs is not None:
        dir_ids = np.zeros(len(dirs), dtype=np.int32)
        for i, d in enumerate(dirs):
            if d not in dir_vocab:
                dir_vocab[d] = len(dir_vocab)
            dir_ids[i] = dir_vocab[d]
    scales = None
    if dtype == "int8":
        row_scale = np.abs(mat).max(axis=1) / 127.0
        mat_q = np.clip(
            np.round(mat / np.maximum(row_scale[:, None], 1e-12)), -127, 127
        ).astype(np.int8)
        return mat_q, row_scale.astype(np.float32), dir_ids, dir_vocab
    return mat, scales, dir_ids, dir_vocab


def save_dense_artifact(
    path: str,
    matrix: np.ndarray,
    scales: Optional[np.ndarray],
    dir_ids: Optional[np.ndarray],
    dir_vocab: Dict[str, int],
    dtype: str,
) -> None:
    """Write the on-disk dense artifact from HOST arrays (the format
    ``DenseIndex.load`` / ``ShardedDenseIndex.load`` read)."""
    os.makedirs(path, exist_ok=True)
    arrays = {
        "dir_ids": dir_ids if dir_ids is not None else np.zeros(0, np.int32),
    }
    if scales is not None:
        arrays["matrix"] = np.asarray(matrix)
        arrays["scales"] = np.asarray(scales, np.float32)
    else:
        arrays["matrix"] = np.asarray(matrix, dtype=np.float32)
    np.savez(os.path.join(path, "dense_arrays.npz"), **arrays)
    with open(os.path.join(path, "dense_meta.json"), "w", encoding="utf-8") as f:
        json.dump(
            {
                "dir_vocab": dir_vocab,
                "has_dir_ids": dir_ids is not None,
                "dtype": dtype,
            },
            f,
        )


def load_dense_arrays(path: str):
    """Read the on-disk dense artifact back as HOST arrays:
    ``(matrix, scales_or_None, dir_ids_or_None, dir_vocab, dtype_str)``."""
    arrays = np.load(os.path.join(path, "dense_arrays.npz"))
    with open(os.path.join(path, "dense_meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    dir_ids = arrays["dir_ids"] if meta["has_dir_ids"] else None
    scales = arrays["scales"] if meta["dtype"] == "int8" else None
    dir_vocab = {k: int(v) for k, v in meta["dir_vocab"].items()}
    return arrays["matrix"], scales, dir_ids, dir_vocab, meta["dtype"]


def pad_dense_query_stream(query_embs, dir_values, dir_vocab, has_dir_col, batch):
    """Normalize + pad the dense query stream to scan form ``[NB, B, D]``
    (zero rows score 0 everywhere and are stripped by the caller), mapping
    per-row dir NAMES to filter ids (-1 none, -2 unknown). One definition
    of the dense stream padding contract, shared by the single-chip and
    sharded indexes. Returns ``(q, dir_f_or_None, Q)``."""
    q = l2_normalize(np.atleast_2d(np.asarray(query_embs, np.float32)))
    Q = q.shape[0]
    n_batches = (Q + batch - 1) // batch
    pad = n_batches * batch - Q
    if pad:
        q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
    # explicit last dim: reshape(0, batch, -1) is rejected for empty streams
    q = q.reshape(n_batches, batch, q.shape[1])
    dir_f = None
    if has_dir_col:
        dvals = list(dir_values or [None] * Q) + [None] * pad
        dir_f = np.array(
            [dir_vocab.get(d, -2) if d else -1 for d in dvals],
            dtype=np.int32,
        ).reshape(n_batches, batch)
    return q, dir_f, Q


def l2_normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(norms, eps)


@dataclass
class DenseIndex:
    """HBM-resident flat cosine index over one content view of the corpus."""

    matrix: jnp.ndarray  # [N, D] normalized, device-resident
    dir_ids: Optional[np.ndarray] = None  # [N] int32 metadata column
    dir_vocab: Dict[str, int] = field(default_factory=dict)
    scales: Optional[jnp.ndarray] = None  # [N] f32, int8 rows only

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        dirs: Optional[list] = None,
        dtype: str = "bfloat16",
    ) -> "DenseIndex":
        mat, scales, dir_ids, dir_vocab = prepare_dense_arrays(
            embeddings, dirs, dtype
        )
        return cls(
            matrix=jnp.asarray(mat)
            if dtype == "int8"
            else jnp.asarray(mat, dtype=jnp.dtype(dtype)),
            dir_ids=dir_ids,
            dir_vocab=dir_vocab,
            scales=jnp.asarray(scales) if scales is not None else None,
        )

    @property
    def num_docs(self) -> int:
        return self.matrix.shape[0]

    def query(
        self,
        query_emb: np.ndarray,
        k: int,
        dir_value: Optional[str] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Single or batched query -> (scores, indices), host arrays."""
        q = np.atleast_2d(np.asarray(query_emb, dtype=np.float32))
        q = l2_normalize(q)
        dir_col = jnp.asarray(self.dir_ids) if self.dir_ids is not None else None
        dir_f = None
        if dir_col is not None:
            fid = self.dir_vocab.get(dir_value, -2) if dir_value else -1
            dir_f = jnp.full((q.shape[0],), fid, dtype=jnp.int32)
        vals, idx = dense_score_topk(
            jnp.asarray(q), self.matrix, k, dir_col=dir_col, dir_filter=dir_f,
            scales=self.scales,
        )
        return np.asarray(vals), np.asarray(idx)

    def query_stream(
        self,
        query_embs: np.ndarray,  # [Q, D]
        k: int,
        dir_values: Optional[list] = None,  # per-row dir names (or None)
        batch: int = 64,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Whole query set in one compiled dispatch; results identical to
        row-wise :meth:`query`, tail padding stripped."""
        dir_col = jnp.asarray(self.dir_ids) if self.dir_ids is not None else None
        q, dir_f, Q = pad_dense_query_stream(
            query_embs, dir_values, self.dir_vocab, dir_col is not None, batch
        )
        tvs, tis, _ = dense_score_topk_stream(
            jnp.asarray(q), self.matrix, k,
            dir_col=dir_col,
            dir_filter=jnp.asarray(dir_f) if dir_f is not None else None,
            scales=self.scales,
        )
        tvs, tis = jax.device_get((tvs, tis))
        return tvs.reshape(-1, k)[:Q], tis.reshape(-1, k)[:Q]

    # -- on-disk artifact ----------------------------------------------------

    def save(self, path: str) -> None:
        save_dense_artifact(
            path,
            np.asarray(self.matrix),
            np.asarray(self.scales, np.float32)
            if self.scales is not None
            else None,
            self.dir_ids,
            self.dir_vocab,
            str(self.matrix.dtype),
        )

    @classmethod
    def load(cls, path: str) -> "DenseIndex":
        matrix, scales, dir_ids, dir_vocab, dtype = load_dense_arrays(path)
        if dtype == "int8":  # exact int8 rows + scales
            return cls(
                matrix=jnp.asarray(matrix),
                dir_ids=dir_ids,
                dir_vocab=dir_vocab,
                scales=jnp.asarray(scales),
            )
        return cls(
            matrix=jnp.asarray(matrix, dtype=jnp.dtype(dtype)),
            dir_ids=dir_ids,
            dir_vocab=dir_vocab,
        )
