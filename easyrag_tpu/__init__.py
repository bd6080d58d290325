"""easyrag_tpu — a TPU-native retrieval-augmented-generation framework.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
BUAADreamer/EasyRAG (the CCF AIOps 2024 network-ops QA pipeline):

* host-side corpus layer: zedx preprocessing, Chinese-aware sentence /
  hierarchical chunking, metadata extraction, ``embed_type`` content views
  (reference: ``src/easyrag/pipeline/ingestion.py``)
* sparse core: jieba + HIT-stopword tokenization feeding an HBM-resident
  CSR postings index scored by TPU kernels with exact rank-bm25
  ``BM25Okapi`` semantics (reference: ``src/easyrag/custom/retrievers.py``)
* dense core: GTE-Qwen2 embeddings in an HBM-resident matrix queried by a
  fused matmul+top-k kernel (replaces the qdrant server)
* fusion / rerank: simple content-dedup fusion + reciprocal rank fusion,
  batched layerwise cross-encoder reranking with early exit and token
  compression (reference: ``src/easyrag/custom/rerankers.py``)
* generation + orchestration: GLM-4/OpenAI-compatible client, HyDE, answer
  refinement, context compression, typed config with the reference's knob
  surface (reference: ``src/easyrag/pipeline/pipeline.py``)
* parallelism: index build and query shard over an ICI device mesh via
  ``shard_map``; per-shard top-k then global merge.
"""

__version__ = "0.1.0"

from .config import EasyRAGConfig, load_config  # noqa: F401
