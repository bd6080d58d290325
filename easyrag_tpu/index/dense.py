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

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def dense_score_topk(
    query: jnp.ndarray,  # [B, D] (normalized)
    matrix: jnp.ndarray,  # [N, D] (normalized, bf16 or f32)
    k: int,
    dir_col: Optional[jnp.ndarray] = None,  # [N] int32
    dir_filter: Optional[jnp.ndarray] = None,  # [B] int32, -1 = no filter
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused cosine scoring + filtered top-k. Returns (scores[B,k], idx[B,k])."""
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
    return topk_desc_reference_order(scores, k)


def l2_normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(norms, eps)


@dataclass
class DenseIndex:
    """HBM-resident flat cosine index over one content view of the corpus."""

    matrix: jnp.ndarray  # [N, D] normalized, device-resident
    dir_ids: Optional[np.ndarray] = None  # [N] int32 metadata column
    dir_vocab: Dict[str, int] = field(default_factory=dict)

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        dirs: Optional[list] = None,
        dtype: str = "bfloat16",
    ) -> "DenseIndex":
        mat = l2_normalize(np.asarray(embeddings, dtype=np.float32))
        dir_ids = None
        dir_vocab: Dict[str, int] = {}
        if dirs is not None:
            dir_ids = np.zeros(len(dirs), dtype=np.int32)
            for i, d in enumerate(dirs):
                if d not in dir_vocab:
                    dir_vocab[d] = len(dir_vocab)
                dir_ids[i] = dir_vocab[d]
        return cls(
            matrix=jnp.asarray(mat, dtype=jnp.dtype(dtype)),
            dir_ids=dir_ids,
            dir_vocab=dir_vocab,
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
            jnp.asarray(q), self.matrix, k, dir_col=dir_col, dir_filter=dir_f
        )
        return np.asarray(vals), np.asarray(idx)

    # -- on-disk artifact ----------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "dense_arrays.npz"),
            matrix=np.asarray(self.matrix, dtype=np.float32),
            dir_ids=self.dir_ids if self.dir_ids is not None else np.zeros(0, np.int32),
        )
        with open(os.path.join(path, "dense_meta.json"), "w", encoding="utf-8") as f:
            json.dump(
                {
                    "dir_vocab": self.dir_vocab,
                    "has_dir_ids": self.dir_ids is not None,
                    "dtype": str(self.matrix.dtype),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "DenseIndex":
        arrays = np.load(os.path.join(path, "dense_arrays.npz"))
        with open(os.path.join(path, "dense_meta.json"), encoding="utf-8") as f:
            meta = json.load(f)
        return cls(
            matrix=jnp.asarray(arrays["matrix"], dtype=jnp.dtype(meta["dtype"])),
            dir_ids=arrays["dir_ids"] if meta["has_dir_ids"] else None,
            dir_vocab={k: int(v) for k, v in meta["dir_vocab"].items()},
        )
