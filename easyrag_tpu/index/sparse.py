"""Sparse (BM25) index: term dictionary + CSR postings + eager scores.

This is the TPU-native replacement for the reference's per-query pure-Python
scoring (``rank_bm25.BM25Okapi`` / ``bm25s`` at
``src/easyrag/custom/retrievers.py:102-151``). Everything data-dependent is
precomputed at build time into flat arrays:

* term dictionary: token -> term id
* CSR postings, term-major: ``term_offsets[V+1]``, ``post_docs[P]``,
  ``post_tfs[P]``
* *eager scores*: because BM25's per-(term, doc) contribution depends only on
  build-time quantities (tf, doc length, idf), the full contribution
  ``idf[t] * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` is precomputed into
  ``post_vals[P]``. Query scoring is then a pure gather + segment-sum, which
  maps onto the TPU as a one-hot matmul scatter (see ``ops/bm25.py``).

Scoring-math parity:

* ``bm25_type=0`` (Okapi, the default): IDF is
  ``ln((N - df + 0.5)/(df + 0.5))`` with negative values floored to
  ``epsilon * mean(idf)`` — rank_bm25's exact semantics, k1=1.5, b=0.75,
  epsilon=0.25 (``retrievers.py:103-118``).
* ``bm25_type=1`` (bm25s default method="lucene"):
  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` and score
  ``idf * tf / (tf + k1*(1-b+b*dl/avgdl))`` (no ``k1+1`` numerator).

A query token occurring q times contributes its row q times (rank_bm25 sums
per query token occurrence); unknown tokens contribute nothing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class BM25Stats:
    """Raw corpus statistics, independent of the scoring variant."""

    num_docs: int
    doc_lens: np.ndarray  # [N] int32 — token count per doc
    avgdl: float
    vocab: Dict[str, int]  # token -> term id
    term_offsets: np.ndarray  # [V+1] int64 — CSR row offsets into postings
    post_docs: np.ndarray  # [P] int32 — doc id per posting
    post_tfs: np.ndarray  # [P] int32 — term frequency per posting


def build_stats(corpus_tokens: Sequence[Sequence[str]]) -> BM25Stats:
    """Tokenized corpus -> packed statistics.

    Term ids are assigned in first-appearance order over the corpus scan
    (deterministic); postings within a term are in ascending doc order by
    construction.
    """
    vocab: Dict[str, int] = {}
    doc_lens = np.zeros(len(corpus_tokens), dtype=np.int32)
    # per-term postings accumulated as parallel lists
    term_docs: List[List[int]] = []
    term_tfs: List[List[int]] = []
    for doc_id, tokens in enumerate(corpus_tokens):
        doc_lens[doc_id] = len(tokens)
        counts: Dict[str, int] = {}
        for tok in tokens:
            counts[tok] = counts.get(tok, 0) + 1
        for tok, tf in counts.items():
            tid = vocab.get(tok)
            if tid is None:
                tid = len(vocab)
                vocab[tok] = tid
                term_docs.append([])
                term_tfs.append([])
            term_docs[tid].append(doc_id)
            term_tfs[tid].append(tf)

    V = len(vocab)
    sizes = np.array([len(d) for d in term_docs], dtype=np.int64)
    term_offsets = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(sizes, out=term_offsets[1:])
    P = int(term_offsets[-1])
    post_docs = np.zeros(P, dtype=np.int32)
    post_tfs = np.zeros(P, dtype=np.int32)
    for tid in range(V):
        lo, hi = term_offsets[tid], term_offsets[tid + 1]
        post_docs[lo:hi] = term_docs[tid]
        post_tfs[lo:hi] = term_tfs[tid]

    n = len(corpus_tokens)
    avgdl = float(doc_lens.sum()) / n if n else 0.0
    return BM25Stats(
        num_docs=n,
        doc_lens=doc_lens,
        avgdl=avgdl,
        vocab=vocab,
        term_offsets=term_offsets,
        post_docs=post_docs,
        post_tfs=post_tfs,
    )


def okapi_idf(stats: BM25Stats, epsilon: float = 0.25) -> np.ndarray:
    """rank_bm25 BM25Okapi IDF with the epsilon floor for negative values."""
    df = np.diff(stats.term_offsets).astype(np.float64)
    n = stats.num_docs
    idf = np.log(n - df + 0.5) - np.log(df + 0.5)
    if len(idf):
        average_idf = float(idf.sum() / len(idf))
        idf = np.where(idf < 0, epsilon * average_idf, idf)
    return idf


def lucene_idf(stats: BM25Stats) -> np.ndarray:
    """bm25s default (method="lucene"): ln(1 + (N - df + 0.5)/(df + 0.5))."""
    df = np.diff(stats.term_offsets).astype(np.float64)
    n = stats.num_docs
    return np.log(1.0 + (n - df + 0.5) / (df + 0.5))


def eager_scores(
    stats: BM25Stats,
    bm25_type: int = 0,
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> np.ndarray:
    """Precompute the per-posting score contribution ``post_vals[P]``."""
    norm = k1 * (1.0 - b + b * stats.doc_lens.astype(np.float64) / max(stats.avgdl, 1e-12))
    tf = stats.post_tfs.astype(np.float64)
    denom = tf + norm[stats.post_docs]
    if bm25_type == 1:
        idf = lucene_idf(stats)
        vals = idf[_posting_terms(stats)] * tf / denom
    else:
        idf = okapi_idf(stats, epsilon=epsilon)
        vals = idf[_posting_terms(stats)] * tf * (k1 + 1.0) / denom
    return vals


def _posting_terms(stats: BM25Stats) -> np.ndarray:
    """Expand CSR offsets into a per-posting term-id array."""
    P = len(stats.post_docs)
    terms = np.zeros(P, dtype=np.int64)
    offs = stats.term_offsets
    np.add.at(terms, offs[1:-1][offs[1:-1] < P], 1)
    return np.cumsum(terms)


@dataclass
class SparseIndex:
    """A query-ready sparse index over one content view of the corpus."""

    stats: BM25Stats
    # [P] float64 — precomputed eager contributions. Kept in f64 so the host
    # path is bit-identical to rank_bm25's float arithmetic; the device path
    # casts to f32 at the gather boundary.
    post_vals: np.ndarray
    bm25_type: int = 0
    k1: float = 1.5
    b: float = 0.75
    epsilon: float = 0.25
    # optional per-doc metadata column for the `dir` equality filter
    dir_ids: Optional[np.ndarray] = None  # [N] int32
    dir_vocab: Dict[str, int] = field(default_factory=dict)

    @property
    def num_docs(self) -> int:
        return self.stats.num_docs

    @property
    def num_postings(self) -> int:
        return len(self.stats.post_docs)

    # -- query-side gather (host) ------------------------------------------

    def query_term_ids(self, query_tokens: Sequence[str]) -> List[int]:
        """Map query tokens to term ids; unknown tokens dropped. Duplicates
        kept (rank_bm25 sums per occurrence)."""
        vocab = self.stats.vocab
        return [vocab[t] for t in query_tokens if t in vocab]

    def gather_postings(
        self,
        term_ids: Sequence[int],
        pad_to: Optional[int] = None,
        bucket: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Concatenate posting slices of the query terms into
        ``(doc_ids, vals)``, padded to a static length with
        ``doc_id == num_docs`` (a drop sentinel for device scatter).

        ``pad_to`` fixes the length exactly; with ``bucket=True`` it is a
        *cap* and the length is the smallest power of two ≥ the need (each
        bucket compiles once). The cap is itself soft — common-term-heavy
        queries may legitimately exceed it, and a bigger transfer beats a
        crash — but the true ceiling is the full postings count.
        """
        offs = self.stats.term_offsets
        chunks_d, chunks_v = [], []
        for tid in term_ids:
            lo, hi = offs[tid], offs[tid + 1]
            chunks_d.append(self.stats.post_docs[lo:hi])
            chunks_v.append(self.post_vals[lo:hi])
        if chunks_d:
            doc_ids = np.concatenate(chunks_d)
            vals = np.concatenate(chunks_v).astype(np.float32)
        else:
            doc_ids = np.zeros(0, dtype=np.int32)
            vals = np.zeros(0, dtype=np.float32)
        if pad_to is not None:
            need = len(doc_ids)
            if bucket:
                size = 1024
                while size < need:
                    size *= 2
                pad_to = size
            elif need > pad_to:
                raise ValueError(
                    f"query postings ({need}) exceed pad_to ({pad_to}); "
                    "raise tpu.max_query_postings or pass bucket=True"
                )
            pad = pad_to - len(doc_ids)
            doc_ids = np.concatenate(
                [doc_ids, np.full(pad, self.num_docs, dtype=np.int32)]
            )
            vals = np.concatenate([vals, np.zeros(pad, dtype=np.float32)])
        return doc_ids.astype(np.int32), vals

    # -- host scoring (oracle / small corpora) ------------------------------

    def get_scores_host(self, query_tokens: Sequence[str]) -> np.ndarray:
        """Exact scores over the full corpus, vectorized numpy (float64)."""
        scores = np.zeros(self.num_docs, dtype=np.float64)
        offs = self.stats.term_offsets
        for tid in self.query_term_ids(query_tokens):
            lo, hi = offs[tid], offs[tid + 1]
            np.add.at(scores, self.stats.post_docs[lo:hi], self.post_vals[lo:hi])
        return scores


def build_sparse_index(
    corpus_tokens: Sequence[Sequence[str]],
    bm25_type: int = 0,
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
    dirs: Optional[Sequence[str]] = None,
    use_native: Optional[bool] = None,
) -> SparseIndex:
    """Build the packed index. ``use_native=None`` auto-selects the C++
    builder when available (identical outputs; ~10x faster build on large
    corpora), True requires it, False forces the Python builder."""
    stats = None
    vals = None
    if use_native is not False:
        from ..native import build_index_native

        built = build_index_native(
            corpus_tokens, k1=k1, b=b, epsilon=epsilon, bm25_type=bm25_type
        )
        if built is not None:
            vocab, doc_lens, term_offsets, post_docs, post_tfs, post_vals = built
            n = len(corpus_tokens)
            stats = BM25Stats(
                num_docs=n,
                doc_lens=doc_lens,
                avgdl=float(doc_lens.sum()) / n if n else 0.0,
                vocab=vocab,
                term_offsets=term_offsets,
                post_docs=post_docs,
                post_tfs=post_tfs,
            )
            vals = post_vals
        elif use_native:
            raise RuntimeError("native index builder requested but unavailable")
    if stats is None:
        stats = build_stats(corpus_tokens)
        vals = eager_scores(stats, bm25_type=bm25_type, k1=k1, b=b, epsilon=epsilon)
    dir_ids = None
    dir_vocab: Dict[str, int] = {}
    if dirs is not None:
        dir_ids = np.zeros(len(dirs), dtype=np.int32)
        for i, d in enumerate(dirs):
            if d not in dir_vocab:
                dir_vocab[d] = len(dir_vocab)
            dir_ids[i] = dir_vocab[d]
    return SparseIndex(
        stats=stats,
        post_vals=vals.astype(np.float64),
        bm25_type=bm25_type,
        k1=k1,
        b=b,
        epsilon=epsilon,
        dir_ids=dir_ids,
        dir_vocab=dir_vocab,
    )


# ---------------------------------------------------------------------------
# On-disk artifact (the qdrant-collection analog for the sparse route)
# ---------------------------------------------------------------------------

def save_sparse_index(index: SparseIndex, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez(
        os.path.join(path, "sparse_arrays.npz"),
        doc_lens=index.stats.doc_lens,
        term_offsets=index.stats.term_offsets,
        post_docs=index.stats.post_docs,
        post_tfs=index.stats.post_tfs,
        post_vals=index.post_vals,
        dir_ids=index.dir_ids if index.dir_ids is not None else np.zeros(0, np.int32),
    )
    meta = {
        "num_docs": index.stats.num_docs,
        "avgdl": index.stats.avgdl,
        "bm25_type": index.bm25_type,
        "k1": index.k1,
        "b": index.b,
        "epsilon": index.epsilon,
        "vocab": index.stats.vocab,
        "dir_vocab": index.dir_vocab,
        "has_dir_ids": index.dir_ids is not None,
    }
    with open(os.path.join(path, "sparse_meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, ensure_ascii=False)


def load_sparse_index(path: str) -> SparseIndex:
    arrays = np.load(os.path.join(path, "sparse_arrays.npz"))
    with open(os.path.join(path, "sparse_meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    stats = BM25Stats(
        num_docs=meta["num_docs"],
        doc_lens=arrays["doc_lens"],
        avgdl=meta["avgdl"],
        vocab={k: int(v) for k, v in meta["vocab"].items()},
        term_offsets=arrays["term_offsets"],
        post_docs=arrays["post_docs"],
        post_tfs=arrays["post_tfs"],
    )
    return SparseIndex(
        stats=stats,
        post_vals=arrays["post_vals"],
        bm25_type=meta["bm25_type"],
        k1=meta["k1"],
        b=meta["b"],
        epsilon=meta["epsilon"],
        dir_ids=arrays["dir_ids"] if meta["has_dir_ids"] else None,
        dir_vocab={k: int(v) for k, v in meta["dir_vocab"].items()},
    )
