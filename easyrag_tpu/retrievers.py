"""Retrievers: sparse (BM25), dense (flat cosine), hybrid fusion.

Behavioral mirror of ``src/easyrag/custom/retrievers.py`` on top of the
TPU-resident indexes:

* :class:`BM25Retriever` — jieba+stopword tokenization, full-corpus scoring,
  ``filter()`` semantics (rank desc, drop score<=0, ``dir`` equality filter,
  top-k) — device path via ``ops.bm25.bm25_score_topk``.
* :class:`DenseRetriever` — query embedding -> fused matmul+top-k over the
  HBM matrix (the ``QdrantRetriever`` replacement, ``retrievers.py:23-69``).
* :class:`HybridRetriever` — ``fusion`` (content dedup + score sort,
  ``retrievers.py:239-253``) and ``reciprocal_rank_fusion`` (K=60,
  ``retrievers.py:256-274``); route dispatch per ``retrieval_type``
  (``retrievers.py:276-291``).

Design note (TPU-first): retrievers hold *array* indexes; the node list is a
host-side column. Queries can be scored one-off (online serving) or in
static-shape batches (offline eval) without changing results.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence  # noqa: F401 (Sequence used in batch API)

import jax
import jax.numpy as jnp
import numpy as np

from .corpus.tokenizer import tokenize_and_remove_stopwords
from .corpus.views import get_node_content
from .index.dense import DenseIndex
from .index.sparse import SparseIndex, build_sparse_index
from .ops.bm25 import bm25_score_topk
from .schema import NodeWithScore, QueryBundle, TextNode
from .utils import run_sync


class BM25Retriever:
    """Sparse retriever over one ``embed_type`` view of the node list."""

    def __init__(
        self,
        nodes: List[TextNode],
        tokenizer,
        stopwords,
        similarity_top_k: int = 192,
        embed_type: int = 0,
        bm25_type: int = 0,
        max_query_postings: int = 32768,
        use_pallas: bool = False,
        use_device: bool = True,
        index: Optional[SparseIndex] = None,
        resident: bool = True,
        max_query_terms: int = 64,
        heavy_dtype: str = "float32",
        heavy_hbm_budget: int = 512 * 1024 * 1024,
        light_rows_hbm_budget: int = 256 * 1024 * 1024,
        mesh=None,
    ) -> None:
        self._nodes = nodes
        self._tokenizer = tokenizer
        self.stopwords = stopwords
        self._similarity_top_k = similarity_top_k
        self.embed_type = embed_type
        self.bm25_type = bm25_type
        self.k1, self.b, self.epsilon = 1.5, 0.75, 0.25
        self.max_query_postings = max_query_postings
        self.use_pallas = use_pallas
        self.use_device = use_device
        self.filter_dict: Optional[Dict[str, str]] = None

        if index is not None:  # loaded from an on-disk artifact
            self.index = index
        else:
            corpus_tokens = [
                tokenize_and_remove_stopwords(
                    tokenizer, get_node_content(node, embed_type), stopwords
                )
                for node in nodes
            ]
            dirs = [node.metadata.get("dir", "") for node in nodes]
            self.index = build_sparse_index(
                corpus_tokens,
                bm25_type=bm25_type,
                k1=self.k1,
                b=self.b,
                epsilon=self.epsilon,
                dirs=dirs,
            )
        self._dir_col = (
            jnp.asarray(self.index.dir_ids) if self.index.dir_ids is not None else None
        )
        # device-resident index: HBM postings, KB-sized queries (the default
        # device path; the gather path remains as overflow fallback)
        self._resident = None
        if use_device and resident:
            if mesh is not None and mesh.shape.get("data", 1) > 1:
                # ICI-sharded resident index: doc ranges over the mesh
                # "data" axis, local top-k + all-gather merge — the corpus
                # scales past one chip's HBM (parallel/sharded.py). Drop-in
                # for the single-chip index (same _score_topk /
                # stream_from_arrays surface).
                from .parallel.sharded import ShardedResidentSparseIndex

                self._resident = ShardedResidentSparseIndex(
                    mesh,
                    self.index,
                    max_query_terms=max_query_terms,
                    heavy_hbm_budget=heavy_hbm_budget,
                    heavy_dtype=heavy_dtype,
                    light_rows_hbm_budget=light_rows_hbm_budget,
                )
            else:
                from .ops.bm25_resident import ResidentSparseIndex

                # NOTE: the Pallas one-hot tail (tail="pallas") is
                # deliberately NOT selected by use_pallas: measured 2.8x
                # SLOWER than the XLA scatter at the default operating
                # point, where most query terms are heavy and the gathered
                # tail is mostly sentinel no-ops the scatter drops for free
                # while the one-hot matmul pays its fixed 2*P*N cost
                # regardless (see BASELINE.md negative results).
                self._resident = ResidentSparseIndex(
                    self.index,
                    max_query_terms=max_query_terms,
                    heavy_dtype=heavy_dtype,
                    heavy_hbm_budget=heavy_hbm_budget,
                    light_rows_hbm_budget=light_rows_hbm_budget,
                )

    # -- scoring -------------------------------------------------------------

    def _tokenize_query(self, query: str) -> List[str]:
        return tokenize_and_remove_stopwords(self._tokenizer, query, self.stopwords)

    def get_scores(self, query: str, docs: Optional[Sequence[str]] = None) -> np.ndarray:
        """Full score vector. With ``docs`` given, builds a throwaway index
        over the ad-hoc texts (compressor path, ``retrievers.py:128-151``)."""
        if docs is None:
            index = self.index
        else:
            corpus_tokens = [
                tokenize_and_remove_stopwords(self._tokenizer, d, self.stopwords)
                for d in docs
            ]
            index = build_sparse_index(
                corpus_tokens,
                bm25_type=self.bm25_type,
                k1=self.k1,
                b=self.b,
                epsilon=self.epsilon,
            )
        return index.get_scores_host(self._tokenize_query(query))

    # -- retrieval -----------------------------------------------------------

    def _dir_filter_value(self) -> int:
        if self.filter_dict is None:
            return -1
        dir_value = self.filter_dict.get("dir")
        if dir_value is None:
            return -1
        return self.index.dir_vocab.get(dir_value, -2)  # -2: unknown dir -> nothing

    def retrieve(self, query_bundle: QueryBundle) -> List[NodeWithScore]:
        query = query_bundle.query_str
        query_tokens = self._tokenize_query(query)
        dir_f = self._dir_filter_value()
        if dir_f == -2:
            return []
        if self.use_device:
            top_vals, top_idx = self._device_topk(query_tokens, dir_f)
            out: List[NodeWithScore] = []
            for v, i in zip(top_vals, top_idx):
                if not np.isfinite(v):
                    break
                out.append(NodeWithScore(node=self._nodes[int(i)], score=float(v)))
            return out
        # host fallback: replicate reference filter() literally
        return self._filter_host(self.index.get_scores_host(query_tokens))

    def _device_topk(self, query_tokens, dir_f: int):
        if self._resident is not None:
            try:
                ids, cnts = self._resident.query_terms(query_tokens)
            except ValueError:
                ids = None  # too many distinct terms: overflow to gather path
            if ids is not None:
                tv, ti = self._resident._score_topk(
                    jnp.asarray(ids[None, :]),
                    jnp.asarray(cnts[None, :]),
                    self._similarity_top_k,
                    jnp.asarray(np.array([dir_f], dtype=np.int32)),
                )
                import jax

                tv, ti = jax.device_get((tv, ti))  # one bulk fetch
                return tv[0], ti[0]
        term_ids = self.index.query_term_ids(query_tokens)
        ids, vals = self.index.gather_postings(
            term_ids, pad_to=self.max_query_postings, bucket=True
        )
        tv, ti = bm25_score_topk(
            jnp.asarray(ids),
            jnp.asarray(vals),
            self.index.num_docs,
            self._similarity_top_k,
            dir_col=self._dir_col,
            dir_filter=jnp.int32(dir_f),
            use_pallas=self.use_pallas,
        )
        return np.asarray(tv), np.asarray(ti)

    def _filter_host(self, scores: np.ndarray) -> List[NodeWithScore]:
        order = scores.argsort(kind="stable")[::-1]
        out: List[NodeWithScore] = []
        for ix in order:
            if scores[ix] <= 0:
                break
            if self.filter_dict is not None:
                if any(
                    self._nodes[ix].metadata.get(k) != v
                    for k, v in self.filter_dict.items()
                ):
                    continue
            out.append(NodeWithScore(node=self._nodes[int(ix)], score=float(scores[ix])))
            if len(out) == self._similarity_top_k:
                break
        return out

    async def aretrieve(self, query_bundle: QueryBundle) -> List[NodeWithScore]:
        return self.retrieve(query_bundle)

    def retrieve_batch(
        self,
        query_bundles: Sequence[QueryBundle],
        filter_dicts: Optional[Sequence[Optional[Dict[str, str]]]] = None,
    ) -> List[List[NodeWithScore]]:
        """Batched retrieval over the device-resident index: one device call
        scores every query (per-row dir filters ride along). Results are
        identical to per-query :meth:`retrieve`. Queries that overflow the
        term budget fall back to the per-query path."""
        if self._resident is None:
            saved = self.filter_dict
            out = []
            for i, qb in enumerate(query_bundles):
                self.filter_dict = filter_dicts[i] if filter_dicts else None
                out.append(self.retrieve(qb))
            self.filter_dict = saved
            return out
        tokens = [self._tokenize_query(qb.query_str) for qb in query_bundles]
        rows: List[Optional[tuple]] = []
        overflow: Dict[int, List[str]] = {}
        try:
            # vectorized prep for the whole stream (the common case)
            bids, bcnts = self._resident.query_terms_batch(tokens)
            rows = [(bids[i], bcnts[i]) for i in range(len(tokens))]
        except ValueError:
            # some query overflowed the term budget: isolate it per query
            for i, toks in enumerate(tokens):
                try:
                    rows.append(self._resident.query_terms(toks))
                except ValueError:
                    rows.append(None)
                    overflow[i] = toks
        dir_fs = []
        for i in range(len(query_bundles)):
            fd = filter_dicts[i] if filter_dicts else None
            if fd is None or fd.get("dir") is None:
                dir_fs.append(-1)
            else:
                dir_fs.append(self.index.dir_vocab.get(fd["dir"], -2))
        # rows whose filter can never match (unknown dir / no dir column)
        # resolve to empty without touching the device
        no_dir_col = self._resident.dir_col is None
        valid = [
            i
            for i, r in enumerate(rows)
            if r is not None and not (dir_fs[i] == -2 and no_dir_col)
        ]
        results: List[List[NodeWithScore]] = [[] for _ in query_bundles]
        if valid:
            ids = np.stack([rows[i][0] for i in valid])
            cnts = np.stack([rows[i][1] for i in valid])
            dirs = np.asarray([dir_fs[i] for i in valid], dtype=np.int32)
            import jax

            if len(valid) > 64:
                # large eval sets: one scan-over-batches dispatch with a
                # FIXED 64-query batch shape (no per-size recompiles, no
                # per-chunk round trip — ~2x end-to-end on the remote
                # attachment, see BASELINE.md stream note)
                tvs, tis, _, q = self._resident.stream_from_arrays(
                    ids, cnts, dirs, self._similarity_top_k, batch=64
                )
                tv, ti = jax.device_get((tvs, tis))
                k = tv.shape[-1]
                tv, ti = tv.reshape(-1, k)[:q], ti.reshape(-1, k)[:q]
            else:
                tv, ti = self._resident._score_topk(
                    jnp.asarray(ids), jnp.asarray(cnts),
                    self._similarity_top_k, jnp.asarray(dirs),
                )
                tv, ti = jax.device_get((tv, ti))  # one bulk fetch
            finites = np.isfinite(tv).sum(axis=1)  # scores desc, -inf tail
            for row, i in enumerate(valid):
                cnt = int(finites[row])
                nodes = self._nodes
                results[i] = [
                    NodeWithScore(node=nodes[j], score=v)
                    for v, j in zip(tv[row, :cnt].tolist(), ti[row, :cnt].tolist())
                ]
        saved = self.filter_dict
        for i in overflow:
            self.filter_dict = filter_dicts[i] if filter_dicts else None
            results[i] = self.retrieve(query_bundles[i])
        self.filter_dict = saved
        return results


class DenseRetriever:
    """Dense retriever: embed the query, hit the HBM cosine index."""

    def __init__(
        self,
        index: DenseIndex,
        nodes: List[TextNode],
        embed_model,
        similarity_top_k: int = 288,
    ) -> None:
        self.index = index
        self._nodes = nodes
        self._embed_model = embed_model
        self._similarity_top_k = similarity_top_k
        self.filters: Optional[str] = None  # a `dir` value, or None

    def retrieve(self, query_bundle: QueryBundle) -> List[NodeWithScore]:
        emb = self._embed_model.get_query_embedding(query_bundle.query_str)
        vals, idx = self.index.query(
            np.asarray(emb), self._similarity_top_k, dir_value=self.filters
        )
        out: List[NodeWithScore] = []
        for v, i in zip(vals[0], idx[0]):
            if not np.isfinite(v):
                break
            out.append(NodeWithScore(node=self._nodes[int(i)], score=float(v)))
        return out

    async def aretrieve(self, query_bundle: QueryBundle) -> List[NodeWithScore]:
        return self.retrieve(query_bundle)

    def retrieve_batch(
        self,
        query_bundles: List[QueryBundle],
        dir_values: Optional[List[Optional[str]]] = None,
    ) -> List[List[NodeWithScore]]:
        """Whole query set in two device streams: one batched query-embedding
        pass (``get_query_embeddings``) and one ``DenseIndex.query_stream``
        dispatch — row-wise identical to :meth:`retrieve` (the sparse route
        got this 2x stream win in round 1; this is the dense counterpart)."""
        queries = [qb.query_str for qb in query_bundles]
        if hasattr(self._embed_model, "get_query_embeddings"):
            embs = np.asarray(self._embed_model.get_query_embeddings(queries))
        else:  # minimal-embedder fallback: per-query loop, still one stream
            embs = np.stack(
                [np.asarray(self._embed_model.get_query_embedding(q)) for q in queries]
            )
        vals, idx = self.index.query_stream(
            embs, self._similarity_top_k, dir_values=list(dir_values or [None] * len(queries))
        )
        lists: List[List[NodeWithScore]] = []
        for row_v, row_i in zip(vals, idx):
            cnt = int(np.isfinite(row_v).sum())  # scores desc, -inf tail
            out = [
                NodeWithScore(node=self._nodes[i], score=v)
                for v, i in zip(row_v[:cnt].tolist(), row_i[:cnt].tolist())
            ]
            lists.append(out)
        return lists


class HybridRetriever:
    """Route dispatch + fusion (``retrievers.py:223-291``)."""

    def __init__(
        self,
        dense_retriever: Optional[DenseRetriever],
        sparse_retriever: Optional[BM25Retriever],
        retrieval_type: int = 1,
        topk: int = 256,
    ) -> None:
        self.dense_retriever = dense_retriever
        self.sparse_retriever = sparse_retriever
        self.retrieval_type = retrieval_type  # 1 dense | 2 sparse | 3 hybrid
        self.filters = None
        self.filter_dict = None
        self.topk = topk

    @classmethod
    def fusion(
        cls, list_of_list_ranks_system: List[List[NodeWithScore]], topk: int = 256
    ) -> List[NodeWithScore]:
        """Dedup by node *content string* keeping first occurrence, then sort
        by score desc (stable), truncate."""
        all_nodes: List[NodeWithScore] = []
        seen = set()
        for nodes in list_of_list_ranks_system:
            for node in nodes:
                content = node.get_content()
                if content not in seen:
                    all_nodes.append(node)
                    seen.add(content)
        all_nodes = sorted(all_nodes, key=lambda n: n.score, reverse=True)
        return all_nodes[: min(len(all_nodes), topk)]

    @classmethod
    def reciprocal_rank_fusion(
        cls,
        list_of_list_ranks_system: List[List[NodeWithScore]],
        K: int = 60,
        topk: int = 256,
    ) -> List[NodeWithScore]:
        """RRF keyed by content string: score = sum 1/(rank + K), 1-based
        ranks; later routes overwrite the representative node object for a
        given content, as in the reference."""
        rrf_map: Dict[str, float] = defaultdict(float)
        text_to_node: Dict[str, NodeWithScore] = {}
        for rank_list in list_of_list_ranks_system:
            for rank, item in enumerate(rank_list, 1):
                content = item.get_content()
                text_to_node[content] = item
                rrf_map[content] += 1.0 / (rank + K)
        sorted_items = sorted(rrf_map.items(), key=lambda x: x[1], reverse=True)
        reranked: List[NodeWithScore] = []
        for text, score in sorted_items:
            node = text_to_node[text]
            node.score = score
            reranked.append(node)
        return reranked[: min(topk, len(reranked))]

    async def aretrieve(self, query_bundle: QueryBundle) -> List[NodeWithScore]:
        sparse_nodes: List[NodeWithScore] = []
        dense_nodes: List[NodeWithScore] = []
        if self.retrieval_type != 1:
            self.sparse_retriever.filter_dict = self.filter_dict
            sparse_nodes = await self.sparse_retriever.aretrieve(query_bundle)
            if self.retrieval_type == 2:
                return sparse_nodes
        if self.retrieval_type != 2:
            self.dense_retriever.filters = self.filters
            dense_nodes = await self.dense_retriever.aretrieve(query_bundle)
            if self.retrieval_type == 1:
                return dense_nodes
        return self.reciprocal_rank_fusion([sparse_nodes, dense_nodes], topk=self.topk)

    def retrieve(self, query_bundle: QueryBundle) -> List[NodeWithScore]:
        import asyncio

        return run_sync(self.aretrieve(query_bundle))
