"""EasyRAGPipeline: config-driven end-to-end orchestration.

Behavioral mirror of ``src/easyrag/pipeline/pipeline.py`` (init at :59-292,
run dispatch at :323-345, retrieval+generation at :351-452) over the
TPU-native components:

* dense route: JAX embedder + HBM cosine index (replaces qdrant)
* sparse dual route: content BM25 (``f_embed_type_2``) + know-path BM25
  (``embed_type=5``), fused with ``HybridRetriever.fusion``
* reranker: batched layerwise cross-encoder on TPU
* generation: OpenAI-compatible GLM-4 client with retry-10

Heavy components (embedder, reranker, LLM) are injectable for tests and
gated by config so the retrieval-only path (``re_only``/``retrieval_type=2``)
runs with no model weights and no network.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

from .compressors import ContextCompressor
from .config import EasyRAGConfig, parse_pool_tiers
from .corpus.extractors import run_extractors
from .corpus.hierarchical import HierarchicalSplitter, get_leaf_nodes
from .corpus.reader import read_data
from .corpus.splitter import SentenceSplitter
from .corpus.tokenizer import JiebaTokenizer, default_stopwords, load_stopwords
from .corpus.views import get_node_content
from .generation import CompletionResponse, HyDETransform, OpenAICompatLLM, generation
from .index.artifact import CorpusArtifact
from .retrievers import BM25Retriever, DenseRetriever, HybridRetriever
from .schema import NodeWithScore, QueryBundle, build_nodeid2idx
from .templates import (
    HYDE_PROMPT_MODIFIED_MERGING,
    HYDE_PROMPT_MODIFIED_V2,
    MERGE_TEMPLATE,
    QA_TEMPLATE,
    PromptTemplate,
)
from .utils.events import emit, trace


def _corpus_fingerprint(data_path: str) -> str:
    """Cheap content fingerprint of the corpus tree (names+sizes+mtimes) so
    a stale artifact is rebuilt when files change — the reference's
    reuse-if-populated qdrant check (``pipeline.py:138-158``) silently
    serves stale data in that case."""
    import hashlib

    h = hashlib.sha256()
    if os.path.isdir(data_path):
        for dirpath, dirnames, filenames in os.walk(data_path):
            dirnames.sort()
            for name in sorted(filenames):
                if not name.endswith(".txt"):
                    continue
                p = os.path.join(dirpath, name)
                st = os.stat(p)
                h.update(
                    f"{os.path.relpath(p, data_path)}:{st.st_size}:{st.st_mtime_ns}".encode()
                )
    return h.hexdigest()[:16]


class EasyRAGPipeline:
    def __init__(
        self,
        config: EasyRAGConfig | Dict[str, Any],
        llm=None,
        embed_model=None,
        reranker=None,
        documents=None,
    ) -> None:
        if isinstance(config, dict):
            config = EasyRAGConfig.from_dict(config)
        self.config = config
        self._init(llm=llm, embed_model=embed_model, reranker=reranker, documents=documents)

    # -- construction ---------------------------------------------------------

    def _init(self, llm, embed_model, reranker, documents) -> None:
        cfg = self.config
        if cfg.tpu.compile_cache_dir:
            # before any model load/compile: boot-time executables (decode
            # buckets, rerank graphs) then come from disk on reboot
            from .utils.compile_cache import enable_compile_cache

            enable_compile_cache(cfg.tpu.compile_cache_dir)
        self.re_only = cfg.re_only
        self.llm_embed_type = cfg.llm_embed_type
        self.r_topk_1 = cfg.r_topk_1
        self.rerank_fusion_type = cfg.rerank_fusion_type
        self.ans_refine_type = cfg.ans_refine_type
        self.hyde = cfg.hyde
        self.hyde_merging = cfg.hyde_merging

        # LLM (lazy network client; only required when generation is used)
        self.local_llm = None
        if llm is not None:
            self.llm = llm
        elif cfg.local_llm_name and cfg.tpu.local_llm_answer:
            # on-chip answer generation (TPU extension): the local decoder
            # replaces the GLM-4 network client — zero network calls in the
            # request path; concurrent requests batch into shared decodes
            from .generation import BatchingLocalLLM, ContinuousBatchingLocalLLM

            self.local_llm = self._make_local_llm(cfg)
            if cfg.tpu.local_llm_continuous:
                if cfg.tpu.local_llm_backend != "jax" or not cfg.tpu.local_llm_max_new:
                    raise ValueError(
                        "tpu.local_llm_continuous needs local_llm_backend=jax "
                        "and local_llm_max_new set (static pool shapes)"
                    )
                self.llm = ContinuousBatchingLocalLLM(
                    self.local_llm,
                    pool_size=cfg.tpu.local_llm_gen_batch,
                    chunk_steps=cfg.tpu.local_llm_chunk_steps,
                    tiers=parse_pool_tiers(cfg.tpu.local_llm_pool_tiers),
                )
            else:
                self.llm = BatchingLocalLLM(
                    self.local_llm,
                    window_ms=cfg.serve_window_ms,
                    max_batch=cfg.tpu.local_llm_gen_batch,
                )
        elif cfg.llm_keys:
            self.llm = OpenAICompatLLM(
                api_keys=cfg.llm_keys, model=cfg.llm_name, api_base=cfg.llm_api_base
            )
        else:
            self.llm = None
        self.qa_template = PromptTemplate(QA_TEMPLATE)
        self.merge_template = PromptTemplate(MERGE_TEMPLATE)
        self.hyde_transform = (
            HyDETransform(self.llm, HYDE_PROMPT_MODIFIED_V2, include_original=True)
            if self.hyde
            else None
        )
        self.hyde_transform_merging = (
            HyDETransform(self.llm, HYDE_PROMPT_MODIFIED_MERGING, include_original=True)
            if self.hyde_merging
            else None
        )

        # device mesh (degenerate 1-device mesh when unconfigured)
        self.mesh = None
        if cfg.tpu.mesh_shape:
            from .parallel.mesh import make_mesh

            self.mesh = make_mesh(cfg.tpu.mesh_shape, cfg.tpu.mesh_axis_names)

        # embedding model (dense routes only)
        self.embed_model = embed_model
        if cfg.retrieval_type != 2 and self.embed_model is None:
            from .models.registry import load_embedder

            self.embed_model = load_embedder(
                cfg.embedding_name,
                cache_folder=cfg.hfmodel_cache_folder,
                embed_type=cfg.f_embed_type_1,
                mesh=self.mesh,
                quant=cfg.tpu.embedder_quant,
            )

        # corpus -> nodes, with artifact fast boot (the reference reuses a
        # populated qdrant collection, pipeline.py:138-158; we persist the
        # whole corpus state incl. the sparse indexes BM25 would otherwise
        # rebuild every boot)
        data_path = os.path.abspath(cfg.data_path)
        fingerprint = {
            "data_path": data_path,
            "corpus": _corpus_fingerprint(data_path),
            "chunk_size": cfg.chunk_size,
            "chunk_overlap": cfg.chunk_overlap,
            "split_type": cfg.split_type,
            "f_embed_type_2": cfg.f_embed_type_2,
            "bm25_type": cfg.bm25_type,
            "f_topk_3": cfg.f_topk_3,
        }
        artifact = (
            CorpusArtifact(cfg.index_artifact_path)
            if cfg.index_artifact_path
            else None
        )
        self.stp_words = (
            load_stopwords(cfg.stopwords_path)
            if cfg.stopwords_path
            else default_stopwords()
        )
        self.sparse_tk = JiebaTokenizer()

        loaded = False
        sparse_content_index = None
        sparse_path_index = None
        if artifact is not None and not cfg.reindex and artifact.matches(fingerprint):
            self.nodes = artifact.load_nodes()
            self.all_nodes = artifact.load_all_nodes() or self.nodes
            sparse_content_index = artifact.load_sparse("content")
            sparse_path_index = artifact.load_sparse("path")
            emit("artifact", {"loaded_nodes": len(self.nodes)})
            loaded = True
        else:
            if documents is None:
                documents = read_data(data_path)
            emit("ingestion", {"documents": len(documents)})
            if cfg.split_type == 1:
                parser = HierarchicalSplitter(
                    chunk_sizes=[cfg.chunk_size * 4, cfg.chunk_size],
                    chunk_overlap=cfg.chunk_overlap,
                )
            else:
                parser = SentenceSplitter(
                    chunk_size=cfg.chunk_size, chunk_overlap=cfg.chunk_overlap
                )
            all_nodes = parser.parse_documents(documents)
            run_extractors(all_nodes, data_path=data_path)
            emit("chunking", {"nodes": len(all_nodes)})
            if cfg.split_type == 1:
                self.nodes = get_leaf_nodes(all_nodes)
                self.all_nodes = all_nodes
            else:
                self.nodes = all_nodes
                self.all_nodes = all_nodes
        self.nodeid2idx = build_nodeid2idx(self.nodes)
        self._ctx_cache: Dict[int, str] = {}  # see get_node_content
        self._ctx_classes = None  # see _content_classes

        # dense index (qdrant replacement): build or load artifact
        self.dense_retriever = None
        if cfg.retrieval_type != 2:
            self.dense_retriever = self._build_dense(self.nodes, cfg)

        self.sparse_retriever = BM25Retriever(
            nodes=self.nodes,
            tokenizer=self.sparse_tk,
            stopwords=self.stp_words,
            similarity_top_k=cfg.f_topk_2,
            embed_type=cfg.f_embed_type_2,
            bm25_type=cfg.bm25_type,
            max_query_postings=cfg.tpu.max_query_postings,
            use_pallas=cfg.tpu.use_pallas,
            index=sparse_content_index,
            heavy_dtype=cfg.tpu.sparse_heavy_dtype,
            heavy_hbm_budget=cfg.tpu.sparse_heavy_hbm_budget,
            light_rows_hbm_budget=cfg.tpu.sparse_light_rows_hbm_budget,
            mesh=self.mesh if cfg.tpu.shard_index else None,
        )
        if cfg.f_topk_3 != 0:
            self.path_retriever = BM25Retriever(
                nodes=self.nodes,
                tokenizer=self.sparse_tk,
                stopwords=self.stp_words,
                similarity_top_k=cfg.f_topk_3,
                embed_type=5,  # know_path view
                bm25_type=cfg.bm25_type,
                max_query_postings=cfg.tpu.max_query_postings,
                use_pallas=cfg.tpu.use_pallas,
                index=sparse_path_index,
                heavy_dtype=cfg.tpu.sparse_heavy_dtype,
                heavy_hbm_budget=cfg.tpu.sparse_heavy_hbm_budget,
                light_rows_hbm_budget=cfg.tpu.sparse_light_rows_hbm_budget,
                mesh=self.mesh if cfg.tpu.shard_index else None,
            )
        else:
            self.path_retriever = None

        if artifact is not None and not loaded:
            artifact.save(
                self.nodes,
                fingerprint,
                sparse_content=self.sparse_retriever.index,
                sparse_path=self.path_retriever.index if self.path_retriever else None,
                all_nodes=self.all_nodes,
            )
            emit("artifact", {"saved_nodes": len(self.nodes)})

        # one-dispatch dual-route scorer: both BM25 routes in a single jit
        # (each dispatch is a network round trip on remote-attached TPUs)
        self._dual_scorer = None
        if (
            self.path_retriever is not None
            and getattr(self.sparse_retriever, "_resident", None) is not None
            and getattr(self.path_retriever, "_resident", None) is not None
        ):
            from .ops.bm25_resident import DualResidentScorer, ResidentSparseIndex

            # sharded residents take the per-route stream path (each route
            # is already one dispatch over the mesh); the fused dual
            # dispatch is a single-chip optimization
            if isinstance(
                self.sparse_retriever._resident, ResidentSparseIndex
            ) and isinstance(self.path_retriever._resident, ResidentSparseIndex):
                self._dual_scorer = DualResidentScorer(
                    self.sparse_retriever._resident,
                    self.path_retriever._resident,
                )

        if cfg.split_type == 1:
            from .automerge import AutoMergingRetriever

            self.sparse_retriever = AutoMergingRetriever(
                self.sparse_retriever, self.all_nodes, simple_ratio_thresh=0.4
            )
            self._dual_scorer = None  # auto-merge needs the per-route path

        # route selection
        if cfg.retrieval_type == 1:
            self.retriever = self.dense_retriever
        elif cfg.retrieval_type == 2:
            self.retriever = self.sparse_retriever
        else:
            self.retriever = HybridRetriever(
                dense_retriever=self.dense_retriever,
                sparse_retriever=self.sparse_retriever,
                retrieval_type=cfg.retrieval_type,
                topk=cfg.f_topk,
            )

        # reranker; the serving layer may set rerank_in_thread so concurrent
        # requests overlap in the rerank stage (required for cross-request
        # coalescing through serving.coalesce.CoalescingScorer)
        self.rerank_in_thread = False
        self.reranker = reranker
        if self.reranker is None and cfg.use_reranker != 0:
            from .models.registry import load_reranker

            self.reranker = load_reranker(
                cfg.reranker_name,
                top_n=cfg.r_topk,
                embed_bs=cfg.r_embed_bs,
                embed_type=cfg.r_embed_type,
                use_efficient=cfg.r_use_efficient,
                use_st=(cfg.use_reranker == 1),
                quant=cfg.tpu.reranker_quant,
                cascade_keep=cfg.tpu.cascade_keep,
                cascade_carry=cfg.tpu.cascade_carry,
            )

        # local LLM (reference pipeline.py:264-279; generation backend per
        # tpu.local_llm_backend — "jax" is the TPU decode path). Already
        # built above when it doubles as the answer LLM.
        if cfg.local_llm_name and self.local_llm is None:
            self.local_llm = self._make_local_llm(cfg)

        # compressor (constructed but not invoked in run(), matching the
        # reference's current behavior — SURVEY.md §2 compressor note)
        if cfg.compress_method:
            self.compressor = ContextCompressor(
                cfg.compress_method,
                cfg.compress_rate,
                bm25_retriever=self.sparse_retriever,
                embed_model=self.embed_model,
            )
        else:
            self.compressor = None

    def _build_dense(self, nodes, cfg: EasyRAGConfig) -> DenseRetriever:
        """Build the HBM cosine index (or load the on-disk artifact).

        Mirrors the reference's reuse-if-populated qdrant collection logic
        (``pipeline.py:138-158``): a saved artifact is loaded unless
        ``reindex`` is set, in which case the corpus is re-embedded.
        """
        import numpy as np

        from .index.dense import (
            DenseIndex,
            load_dense_arrays,
            prepare_dense_arrays,
            save_dense_artifact,
        )

        shard = (
            cfg.tpu.shard_index
            and self.mesh is not None
            and self.mesh.shape.get("data", 1) > 1
        )
        artifact = cfg.index_artifact_path or os.path.join(cfg.cache_path, cfg.collection_name)
        if (
            not cfg.reindex
            and os.path.exists(os.path.join(artifact, "dense_arrays.npz"))
        ):
            if shard:
                # host-side artifact load, staleness-checked BEFORE any
                # device upload — the full matrix never lands on one device
                # (sharding exists for corpora past a single chip's HBM)
                from .parallel.sharded import ShardedDenseIndex

                arrays = load_dense_arrays(artifact)
                index = (
                    ShardedDenseIndex.from_arrays(self.mesh, *arrays)
                    if arrays[0].shape[0] == len(nodes)
                    else None
                )
            else:
                index = DenseIndex.load(artifact)
                if index.num_docs != len(nodes):
                    index = None
            if index is not None:
                emit("dense_index", {"loaded": index.num_docs})
                return DenseRetriever(
                    index, nodes, self.embed_model,
                    similarity_top_k=cfg.f_topk_1,
                )
        texts = [get_node_content(n, cfg.f_embed_type_1) for n in nodes]
        embeddings = np.asarray(self.embed_model.get_text_embeddings(texts))
        dirs = [n.metadata.get("dir", "") for n in nodes]
        if shard:
            from .parallel.sharded import ShardedDenseIndex

            # prepare host arrays once: shard them AND write the artifact
            # (same on-disk format as the single-chip index)
            arrays = prepare_dense_arrays(embeddings, dirs, cfg.tpu.index_dtype)
            index = ShardedDenseIndex.from_arrays(
                self.mesh, *arrays, cfg.tpu.index_dtype
            )
            save_dense_artifact(artifact, *arrays, cfg.tpu.index_dtype)
        else:
            index = DenseIndex.build(embeddings, dirs=dirs, dtype=cfg.tpu.index_dtype)
            index.save(artifact)
        emit("dense_index", {"built": index.num_docs})
        return DenseRetriever(
            index, nodes, self.embed_model, similarity_top_k=cfg.f_topk_1
        )

    # -- query-time helpers ---------------------------------------------------

    def build_filters(self, query: Dict[str, Any]) -> Tuple[Optional[str], Optional[Dict]]:
        """``query["document"]`` -> (dense dir filter, sparse filter dict)
        (``pipeline.py:301-312``)."""
        filters = None
        filter_dict = None
        if "document" in query and query["document"] != "":
            filters = query["document"]
            filter_dict = {"dir": query["document"]}
        return filters, filter_dict

    def sort_by_retrieval(self, nodes):
        """Re-sort reranked nodes by their preserved retrieval score
        (``pipeline.py:347-349``)."""
        return sorted(
            nodes,
            key=lambda x: -x.node.metadata["retrieval_score"] if x.score else 0,
        )

    def get_node_content(self, node) -> str:
        # corpus nodes (idx >= 0) are immutable post-ingest and the view
        # parameters are fixed per pipeline, so the rendered view is cached
        # by dense node id — batch eval renders the same node for hundreds
        # of queries (tools/profile_retrieval.py hot spot). Nodes outside
        # the corpus ordering (idx -1: parents, ad-hoc) render uncached.
        inner = node.node if isinstance(node, NodeWithScore) else node
        idx = getattr(inner, "idx", -1)
        if idx >= 0:
            cached = self._ctx_cache.get(idx)
            if cached is None:
                cached = get_node_content(
                    inner, embed_type=self.llm_embed_type, nodes=self.nodes,
                    nodeid2idx=self.nodeid2idx,
                )
                self._ctx_cache[idx] = cached
            return cached
        return get_node_content(
            inner, embed_type=self.llm_embed_type, nodes=self.nodes,
            nodeid2idx=self.nodeid2idx,
        )

    @staticmethod
    def _make_local_llm(cfg):
        """Local generation backend per ``tpu.local_llm_backend``
        (reference ``pipeline.py:264-279``; "jax" is the TPU decode path,
        models/decode.py)."""
        if cfg.tpu.local_llm_backend == "jax":
            from .models.decode import JaxCausalLM

            return JaxCausalLM(
                cfg.local_llm_name,
                quant=cfg.tpu.local_llm_quant,
                max_new_tokens=cfg.tpu.local_llm_max_new or None,
                max_batch=cfg.tpu.local_llm_gen_batch,
                spec_tokens=cfg.tpu.local_llm_spec,
                spec_ngram=cfg.tpu.local_llm_spec_ngram,
            )
        from .generation import LocalHFLLM

        return LocalHFLLM(cfg.local_llm_name)

    def local_llm_generate(self, query: str) -> str:
        """Local-model generation (reference ``pipeline.py:320-321``) —
        greedy chat completion through the configured ``local_llm`` backend
        (TPU KV-cache decoder or the torch parity wrapper)."""
        if self.local_llm is None:
            raise RuntimeError("local_llm_name not configured")
        return self.local_llm.generate(query)

    async def generation(self, llm, prompt: str) -> CompletionResponse:
        if llm is None:
            raise RuntimeError(
                "no LLM configured (llm_keys empty); use re_only=true for "
                "retrieval-only runs"
            )
        return await generation(llm, prompt)

    # -- run ------------------------------------------------------------------

    async def run(self, query: Dict[str, Any]) -> Dict[str, Any]:
        """``{"query": ..., "document": optional dir}`` ->
        ``{"answer", "nodes", "contexts"}`` (``pipeline.py:323-345``)."""
        if self.hyde:
            hyde_bundle = await self.hyde_transform.acall(query["query"])
            query["hyde_query"] = hyde_bundle.custom_embedding_strs[0]
        self.filters, self.filter_dict = self.build_filters(query)
        if self.rerank_fusion_type == 0:
            if isinstance(self.retriever, HybridRetriever):
                self.retriever.filters = self.filters
                self.retriever.filter_dict = self.filter_dict
            elif isinstance(self.retriever, DenseRetriever):
                self.retriever.filters = self.filters
            else:
                self.retriever.filter_dict = self.filter_dict
            return await self.generation_with_knowledge_retrieval(
                query_str=query["query"], hyde_query=query.get("hyde_query", "")
            )
        if self.dense_retriever is not None:
            self.dense_retriever.filters = self.filters
        self.sparse_retriever.filter_dict = self.filter_dict
        return await self.generation_with_rerank_fusion(query_str=query["query"])

    async def run_retrieval_batch(
        self, queries: list[Dict[str, Any]]
    ) -> list[Dict[str, Any]]:
        """Batched retrieval-only slice: one device call scores every query
        of the batch on the resident sparse index (per-row dir filters).
        Equivalent to per-query ``run`` with ``re_only`` on the default
        (``rerank_fusion_type=0``, no reranker) path; falls back to the
        per-query loop otherwise."""
        batchable = (
            self.rerank_fusion_type == 0
            and self.reranker is None
            and not self.hyde
            and isinstance(self.sparse_retriever, BM25Retriever)
        )
        fusion_batchable = (
            self.rerank_fusion_type != 0
            and self.reranker is None
            and not self.hyde
            and self.dense_retriever is not None
            and isinstance(self.sparse_retriever, BM25Retriever)
        )
        if fusion_batchable:
            return self._run_fusion_retrieval_batch(queries)
        if not batchable:
            return [await self.run(dict(q)) for q in queries]
        out = []
        for fused in self._sparse_fused_batch(queries):
            contents = [self.get_node_content(n) for n in fused]
            out.append({"answer": "", "nodes": fused, "contexts": contents})
        return out

    def _sparse_fused_batch(self, queries):
        """Device-streamed sparse dual-route retrieval + fusion for a whole
        query list: one compiled dispatch scores every (query, route), then
        host fusion dedups via integer content classes. The shared core of
        ``run_retrieval_batch`` and ``run_answers_batch``."""
        bundles = [QueryBundle(query_str=q["query"]) for q in queries]
        filter_dicts = [self.build_filters(q)[1] for q in queries]
        with trace("retrieval_batch"):
            lists = None
            if self._dual_scorer is not None and self.path_retriever is not None:
                lists = self._dual_retrieve_stream(bundles, filter_dicts)
            if lists is not None:
                content_lists, path_lists = lists
            elif self.path_retriever is not None:
                content_lists = self.sparse_retriever.retrieve_batch(
                    bundles, filter_dicts
                )
                path_lists = self.path_retriever.retrieve_batch(bundles)
            else:
                content_lists = self.sparse_retriever.retrieve_batch(
                    bundles, filter_dicts
                )
                path_lists = [[] for _ in queries]
        return [
            self._fuse_corpus_lists([content_nodes, path_nodes])
            for content_nodes, path_nodes in zip(content_lists, path_lists)
        ]

    async def run_answers_batch(
        self, queries: list[Dict[str, Any]]
    ) -> list[Dict[str, Any]]:
        """Staged batch answers — the TPU-first shape of the reference's
        batch eval (``/root/reference/src/main.py:48-52``, a sequential
        per-query loop): (1) ONE device stream retrieves every query,
        (2) the reranker runs per query in device-sized pair batches,
        (3) generation fuses prompts into bucketed ``gen_batch``-row
        decodes (``JaxCausalLM.generate_batch``) — decode is weight-
        bandwidth-bound, so rows amortize the per-step weight read
        (measured 7.7x aggregate tok/s at B=8, BASELINE.md).

        Falls back to the sequential ``run`` loop when the config can't
        stage (non-default path, HyDE, no batch-capable local LLM, or an
        answer LLM that is NOT the local decoder — staging generates via
        ``self.local_llm``, so it is only answer-equivalent when the
        sequential path's ``self.llm`` is that same decoder). Answer
        parity with the sequential path is pinned in
        tests/test_gen_batch.py::test_run_answers_batch_matches_sequential.
        """
        gen = getattr(self, "local_llm", None)
        stageable = (
            self.rerank_fusion_type == 0
            and not self.hyde
            and not self.hyde_merging
            and isinstance(self.sparse_retriever, BM25Retriever)
            and (
                self.re_only
                or (
                    hasattr(gen, "generate_batch")
                    and self._answers_via_local_llm()
                )
            )
        )
        if not stageable:
            return [await self.run(dict(q)) for q in queries]
        fused_lists = self._sparse_fused_batch(queries)
        return await self._run_answers_staged(queries, fused_lists, gen)

    def _answers_via_local_llm(self) -> bool:
        """True when the sequential ``run()`` path's answer LLM IS the
        local decoder — directly, or behind one of the batching wrappers
        (both expose the decoder as ``.model``). Guards the staged batch
        path: with ``local_llm_name`` set but ``tpu.local_llm_answer``
        off, ``self.llm`` is the network client and staging would
        silently answer with a different model (advisor r4, medium)."""
        gen = getattr(self, "local_llm", None)
        if gen is None:
            return False
        return self.llm is gen or getattr(self.llm, "model", None) is gen

    async def _run_answers_staged(self, queries, fused_lists, gen):
        results = []
        prompts = []
        for q, fused in zip(queries, fused_lists):
            if self.reranker:
                bundle = QueryBundle(query_str=q["query"])
                emit("reranking", {"candidates": len(fused)})
                with trace("rerank"):
                    fused = await self._apply_reranker(fused, bundle)
            contents = [self.get_node_content(n) for n in fused]
            results.append({"answer": "", "nodes": fused, "contexts": contents})
            if not self.re_only:
                context_str = "\n\n".join(
                    f"### 文档{i}: {c}" for i, c in enumerate(contents)
                )
                prompts.append(
                    self.qa_template.format(
                        context_str=context_str, query_str=q["query"]
                    )
                )
        if self.re_only:
            return results
        with trace("generation"):
            answers = gen.generate_batch(prompts)
        if self.ans_refine_type == 1:
            merge_prompts = [
                self.merge_template.format(
                    context_str=res["contexts"][0] if res["contexts"] else "",
                    query_str=q["query"],
                    answer_str=ans,
                )
                for q, res, ans in zip(queries, results, answers)
            ]
            answers = gen.generate_batch(merge_prompts)
        for res, ans in zip(results, answers):
            if self.ans_refine_type == 2 and res["contexts"]:
                ans = ans + "\n\n" + res["contexts"][0]
            res["answer"] = ans
        return results

    def _content_classes(self):
        """Dense-id content-dedup classes: ``cls[idx]`` is the idx of the
        FIRST corpus node with the same rendered content. Lets batch fusion
        dedup on ints instead of re-hashing ~200k content strings per
        512-query batch (tools/profile_retrieval.py hot spot); built once,
        nodes are immutable post-ingest."""
        if self._ctx_classes is None:
            first: Dict[str, int] = {}
            self._ctx_classes = [
                first.setdefault(n.get_content(), i)
                for i, n in enumerate(self.nodes)
            ]
        return self._ctx_classes

    def _fuse_corpus_lists(self, lists):
        """``HybridRetriever.fusion`` (dedup by content keeping first
        occurrence, stable sort by score desc, top 256) computed via the
        integer content classes. Falls back to the string-keyed classmethod
        when any node lacks a corpus idx — results are identical either
        way (``test_pipeline.py::test_fast_fusion_matches_reference``)."""
        if not all(
            nw.node.idx >= 0 for nodes in lists for nw in nodes
        ):
            return HybridRetriever.fusion(lists)
        cls = self._content_classes()
        seen = set()
        fused = []
        for nodes in lists:
            for nw in nodes:
                c = cls[nw.node.idx]
                if c not in seen:
                    seen.add(c)
                    fused.append(nw)
        fused.sort(key=lambda n: n.score, reverse=True)
        return fused[:256]

    def _run_fusion_retrieval_batch(
        self, queries: list[Dict[str, Any]]
    ) -> list[Dict[str, Any]]:
        """Batched retrieval-only slice of ``generation_with_rerank_fusion``
        (retrieval_type 1/3 operating point: dense top-288 + sparse top-192,
        RRF to ``r_topk_1``): the whole query set runs as one batched query-
        embedding pass + one ``DenseIndex.query_stream`` dispatch + one
        sparse stream — row-wise identical to the per-query path
        (reference ``pipeline.py:393-414`` with ``re_only``)."""
        bundles = [QueryBundle(query_str=q["query"]) for q in queries]
        pairs = [self.build_filters(q) for q in queries]
        dir_values = [p[0] for p in pairs]  # dense route: `dir` name or None
        filter_dicts = [p[1] for p in pairs]  # sparse route: {'dir': ...}
        with trace("retrieval_batch"):
            dense_lists = self.dense_retriever.retrieve_batch(
                bundles, dir_values
            )
            sparse_lists = self.sparse_retriever.retrieve_batch(
                bundles, filter_dicts
            )
        out = []
        for sparse_nodes, dense_nodes in zip(sparse_lists, dense_lists):
            fused = self._rrf_corpus_lists(
                [sparse_nodes, dense_nodes], topk=self.r_topk_1
            )
            contents = [self.get_node_content(n) for n in fused]
            out.append({"answer": "", "nodes": fused, "contexts": contents})
        return out

    def _rrf_corpus_lists(self, lists, K: int = 60, topk: int = 256):
        """``HybridRetriever.reciprocal_rank_fusion`` via the integer
        content classes (same dedup/overwrite/tie semantics — first-insert
        order breaks score ties, later routes overwrite the representative
        node; ``test_pipeline.py::test_fast_rrf_matches_reference``). String
        fallback when any node lacks a corpus idx."""
        if not all(nw.node.idx >= 0 for nodes in lists for nw in nodes):
            return HybridRetriever.reciprocal_rank_fusion(lists, K=K, topk=topk)
        cls = self._content_classes()
        rrf: Dict[int, float] = {}
        rep: Dict[int, NodeWithScore] = {}
        for rank_list in lists:
            for rank, item in enumerate(rank_list, 1):
                c = cls[item.node.idx]
                rep[c] = item
                rrf[c] = rrf.get(c, 0.0) + 1.0 / (rank + K)
        fused = []
        for c, score in sorted(rrf.items(), key=lambda x: x[1], reverse=True):
            node = rep[c]
            node.score = score
            fused.append(node)
        return fused[: min(topk, len(fused))]

    def _dual_retrieve(self, query_bundle: QueryBundle):
        """Both BM25 routes in one device dispatch when the dual scorer is
        available and the query fits the term budget; None -> caller falls
        back to per-route retrieval. Content route takes the dir filter,
        path route is unfiltered (reference ``pipeline.py:357-365``)."""
        if self._dual_scorer is None:
            return None
        sparse = self.sparse_retriever
        sparse.filter_dict = self.filter_dict
        tokens = sparse._tokenize_query(query_bundle.query_str)
        dir_f = sparse._dir_filter_value()
        try:
            sparse._resident.query_terms(tokens)
            self.path_retriever._resident.query_terms(tokens)
        except ValueError:
            return None  # term-budget overflow: per-route gather fallback
        (tv1, ti1), (tv2, ti2) = self._dual_scorer.score_topk(
            [tokens],
            sparse._similarity_top_k,
            self.path_retriever._similarity_top_k,
            [dir_f],
        )

        def to_nodes(tv, ti, allow):
            out = []
            if not allow:
                return out
            import numpy as np

            for v, i in zip(tv[0], ti[0]):
                if not np.isfinite(v):
                    break
                out.append(NodeWithScore(node=self.nodes[int(i)], score=float(v)))
            return out

        # -2 with no dir column can never match (host-resolved, as in
        # BM25Retriever.retrieve)
        content_allow = not (dir_f == -2 and sparse._resident.dir_col is None)
        return to_nodes(tv1, ti1, content_allow), to_nodes(tv2, ti2, True)

    def _dual_retrieve_stream(self, bundles, filter_dicts):
        """Both routes of a whole query batch in ONE compiled dispatch
        (scan over fixed 64-query batches) — the batch-eval form of
        :meth:`_dual_retrieve`, with identical per-row semantics: content
        route takes the dir filter, path route is unfiltered; term-budget
        overflow rows fall back to per-query retrieval."""
        import numpy as np

        sparse, path = self.sparse_retriever, self.path_retriever
        tokens = [sparse._tokenize_query(qb.query_str) for qb in bundles]
        dir_fs = []
        for i in range(len(tokens)):
            fd = filter_dicts[i] if filter_dicts else None
            if fd is None or fd.get("dir") is None:
                dir_fs.append(-1)
            else:
                dir_fs.append(sparse.index.dir_vocab.get(fd["dir"], -2))
        prepped = None
        try:
            # vectorized prep for the whole batch (the common case has no
            # overflow); the arrays feed the scorer directly — per-query
            # isolation only on failure
            prepped = (
                *sparse._resident.query_terms_batch(tokens),
                *path._resident.query_terms_batch(tokens),
            )
            valid, overflow = list(range(len(tokens))), []
        except ValueError:
            valid, overflow = [], []
            for i, toks in enumerate(tokens):
                try:
                    sparse._resident.query_terms(toks)
                    path._resident.query_terms(toks)
                    valid.append(i)
                except ValueError:
                    overflow.append(i)

        def to_nodes(tv_row, ti_row):
            # scores come back sorted descending with -inf padding the tail,
            # so the finite prefix is contiguous; .tolist() up front avoids
            # 196k numpy-scalar conversions per 512-query batch (profiled
            # hot spot — tools/profile_retrieval.py)
            finite = int(np.isfinite(tv_row).sum())
            nodes = self.nodes
            return [
                NodeWithScore(node=nodes[j], score=v)
                for v, j in zip(tv_row[:finite].tolist(), ti_row[:finite].tolist())
            ]

        content_lists = [[] for _ in bundles]
        path_lists = [[] for _ in bundles]
        if valid:
            if prepped is None:
                prepped = (
                    *sparse._resident.query_terms_batch(
                        [tokens[i] for i in valid]
                    ),
                    *path._resident.query_terms_batch(
                        [tokens[i] for i in valid]
                    ),
                )
            (tv1, ti1), (tv2, ti2) = self._dual_scorer.stream_from_arrays(
                *prepped,
                [dir_fs[i] for i in valid],
                sparse._similarity_top_k,
                path._similarity_top_k,
            )
            no_dir_col = sparse._resident.dir_col is None
            for row, i in enumerate(valid):
                if not (dir_fs[i] == -2 and no_dir_col):
                    content_lists[i] = to_nodes(tv1[row], ti1[row])
                path_lists[i] = to_nodes(tv2[row], ti2[row])
        saved = sparse.filter_dict
        for i in overflow:
            sparse.filter_dict = filter_dicts[i] if filter_dicts else None
            content_lists[i] = sparse.retrieve(bundles[i])
            path_lists[i] = path.retrieve(bundles[i])
        sparse.filter_dict = saved
        return content_lists, path_lists

    async def _apply_reranker(self, nodes, query_bundle):
        """Run the rerank stage, in a worker thread when the serving layer
        enabled cross-request coalescing (threads let concurrent requests'
        pairs meet in the CoalescingScorer queue)."""
        if self.rerank_in_thread:
            import asyncio

            return await asyncio.to_thread(
                self.reranker.postprocess_nodes, nodes, query_bundle
            )
        return self.reranker.postprocess_nodes(nodes, query_bundle)

    async def generation_with_knowledge_retrieval(
        self, query_str: str, hyde_query: str = ""
    ) -> Dict[str, Any]:
        """Default path (``pipeline.py:351-391``): sparse dual route ->
        fusion -> rerank -> QA generation -> optional answer refinement."""
        query_bundle = QueryBundle(query_str=query_str + hyde_query)
        with trace("retrieval"):
            routes = self._dual_retrieve(query_bundle)
            if routes is not None:
                node_with_scores, node_with_scores_path = routes
            else:
                node_with_scores = await self.sparse_retriever.aretrieve(query_bundle)
                if self.path_retriever is not None:
                    node_with_scores_path = await self.path_retriever.aretrieve(
                        query_bundle
                    )
                else:
                    node_with_scores_path = []
            node_with_scores = HybridRetriever.fusion(
                [node_with_scores, node_with_scores_path]
            )
        if self.reranker:
            if self.hyde_merging and self.hyde:
                seed = (
                    f"问题：{query_str},\n 可能有用的提示文档:{hyde_query},\n "
                    f"检索得到的相关上下文：{self.get_node_content(node_with_scores[0])}"
                )
                merged = await self.hyde_transform_merging.acall(seed)
                query_bundle = QueryBundle(
                    query_str=query_str + "\n" + merged.custom_embedding_strs[0]
                )
            emit("reranking", {"candidates": len(node_with_scores)})
            with trace("rerank"):
                node_with_scores = await self._apply_reranker(
                    node_with_scores, query_bundle
                )
        contents = [self.get_node_content(node) for node in node_with_scores]
        context_str = "\n\n".join(
            f"### 文档{i}: {content}" for i, content in enumerate(contents)
        )
        if self.re_only:
            return {"answer": "", "nodes": node_with_scores, "contexts": contents}
        prompt = self.qa_template.format(context_str=context_str, query_str=query_str)
        with trace("generation"):
            ret = await self.generation(self.llm, prompt)
        if self.ans_refine_type == 1:
            merge_prompt = self.merge_template.format(
                context_str=contents[0], query_str=query_str, answer_str=ret.text
            )
            ret = await self.generation(self.llm, merge_prompt)
        elif self.ans_refine_type == 2:
            ret.text = ret.text + "\n\n" + contents[0]
        return {"answer": ret.text, "nodes": node_with_scores, "contexts": contents}

    async def generation_with_rerank_fusion(self, query_str: str) -> Dict[str, Any]:
        """Two-route alternate path (``pipeline.py:393-452``): rerank each
        route separately, RRF, then one generation (type 1) or two
        generations picking the longer / concatenating (types 2/3)."""
        query_bundle = QueryBundle(query_str=query_str)

        dense_nodes = await self.dense_retriever.aretrieve(query_bundle)
        if self.reranker:
            dense_nodes = await self._apply_reranker(dense_nodes, query_bundle)
        sparse_nodes = await self.sparse_retriever.aretrieve(query_bundle)
        if self.reranker:
            sparse_nodes = await self._apply_reranker(sparse_nodes, query_bundle)

        node_with_scores = HybridRetriever.reciprocal_rank_fusion(
            [sparse_nodes, dense_nodes], topk=self.r_topk_1
        )

        if self.re_only:
            contents = [self.get_node_content(n) for n in node_with_scores]
            return {"answer": "", "nodes": node_with_scores, "contexts": contents}

        if self.rerank_fusion_type == 1:
            contents = [self.get_node_content(n) for n in node_with_scores]
            context_str = "\n\n".join(
                f"### 文档{i}: {c}" for i, c in enumerate(contents)
            )
            ret = await self.generation(
                self.llm,
                self.qa_template.format(context_str=context_str, query_str=query_str),
            )
        else:
            contents = [self.get_node_content(n) for n in sparse_nodes]
            context_str = "\n\n".join(
                f"### 文档{i}: {c}" for i, c in enumerate(contents)
            )
            ret_sparse = await self.generation(
                self.llm,
                self.qa_template.format(context_str=context_str, query_str=query_str),
            )
            contents = [self.get_node_content(n) for n in dense_nodes]
            context_str = "\n\n".join(
                f"### 文档{i}: {c}" for i, c in enumerate(contents)
            )
            ret_dense = await self.generation(
                self.llm,
                self.qa_template.format(context_str=context_str, query_str=query_str),
            )
            if self.rerank_fusion_type == 2:
                ret = ret_dense if len(ret_dense.text) >= len(ret_sparse.text) else ret_sparse
            else:
                ret = CompletionResponse(text=ret_sparse.text + ret_dense.text)

        return {"answer": ret.text, "nodes": node_with_scores, "contexts": contents}
