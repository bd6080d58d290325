"""Pipeline-level index sharding (``tpu.shard_index``): the full RAG
retrieval slice with the sparse postings and dense matrix sharded over the
mesh "data" axis must return exactly what the single-chip pipeline returns.

This is the config-reachable form of the standalone sharded-index parity
tests (``test_sharded.py``) — the reference has no distributed story
(SURVEY §2: parallelism is a new first-class mandate), so the gate here is
self-consistency with the single-chip path, which itself is parity-tested
against the host oracle.
"""

import asyncio

import numpy as np
import pytest

from easyrag_tpu.config import EasyRAGConfig, TPUConfig
from easyrag_tpu.pipeline import EasyRAGPipeline
from easyrag_tpu.utils import run_sync

from test_pipeline import FakeEmbedder, _config, _make_corpus, _run


def _sharded_tpu(**kw):
    return TPUConfig(
        use_pallas=False,
        max_query_postings=2048,
        mesh_shape=[8],
        mesh_axis_names=["data"],
        shard_index=True,
        **kw,
    )


def _two_dirs(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir()
    b.mkdir()
    return a, b


def test_sharded_sparse_pipeline_matches_single_chip(tmp_path):
    a, b = _two_dirs(tmp_path)
    cfg_s = _config(a, tpu=_sharded_tpu())
    cfg_1 = _config(b)
    sharded = EasyRAGPipeline(cfg_s)
    single = EasyRAGPipeline(cfg_1)

    from easyrag_tpu.parallel.sharded import ShardedResidentSparseIndex

    assert isinstance(
        sharded.sparse_retriever._resident, ShardedResidentSparseIndex
    )
    assert sharded._dual_scorer is None  # fused dual dispatch is single-chip

    queries = [
        {"query": "CDU虚机扩容的最大SC个数是多少？"},
        {"query": "鉴权失败如何处理？", "document": "umac"},
        {"query": "备份", "document": "不存在的目录"},  # never-match filter
    ]
    for q in queries:
        rs = _run(sharded, dict(q))
        r1 = _run(single, dict(q))
        assert rs["contexts"] == r1["contexts"]
        assert [round(n.score or 0, 5) for n in rs["nodes"]] == [
            round(n.score or 0, 5) for n in r1["nodes"]
        ]


def test_sharded_sparse_batch_matches_single_chip(tmp_path):
    a, b = _two_dirs(tmp_path)
    sharded = EasyRAGPipeline(_config(a, tpu=_sharded_tpu()))
    single = EasyRAGPipeline(_config(b))
    base = [
        {"query": "CDU虚机扩容的最大SC个数是多少？"},
        {"query": "鉴权失败如何处理？", "document": "umac"},
        {"query": "备份"},
    ]
    # >64 rows so the sharded stream path (scan + tail padding) runs
    queries = [dict(base[i % len(base)]) for i in range(67)]
    bs = run_sync(
        sharded.run_retrieval_batch([dict(q) for q in queries])
    )
    b1 = run_sync(
        single.run_retrieval_batch([dict(q) for q in queries])
    )
    for s, o in zip(bs, b1):
        assert s["contexts"] == o["contexts"]


def test_sharded_dense_pipeline_matches_single_chip(tmp_path):
    a, b = _two_dirs(tmp_path)
    cfg_s = _config(
        a,
        retrieval_type=3,
        rerank_fusion_type=1,
        f_topk=6,
        f_topk_1=4,
        r_topk_1=4,
        cache_path=str(tmp_path / "cache_s"),
        tpu=_sharded_tpu(index_dtype="float32"),
    )
    cfg_1 = _config(
        b,
        retrieval_type=3,
        rerank_fusion_type=1,
        f_topk=6,
        f_topk_1=4,
        r_topk_1=4,
        cache_path=str(tmp_path / "cache_1"),
        tpu=TPUConfig(
            use_pallas=False, max_query_postings=2048, index_dtype="float32"
        ),
    )
    sharded = EasyRAGPipeline(cfg_s, embed_model=FakeEmbedder())
    single = EasyRAGPipeline(cfg_1, embed_model=FakeEmbedder())

    from easyrag_tpu.parallel.sharded import ShardedDenseIndex

    assert isinstance(sharded.dense_retriever.index, ShardedDenseIndex)

    queries = [
        {"query": "CDU虚机扩容的最大SC个数是多少？"},
        {"query": "鉴权失败如何处理？", "document": "umac"},
        {"query": "备份"},
    ]
    for q in queries:
        rs = _run(sharded, dict(q))
        r1 = _run(single, dict(q))
        assert rs["contexts"] == r1["contexts"]
    # batched form too (dense query_stream over the mesh)
    bs = run_sync(
        sharded.run_retrieval_batch([dict(q) for q in queries])
    )
    b1 = run_sync(
        single.run_retrieval_batch([dict(q) for q in queries])
    )
    for s, o in zip(bs, b1):
        assert s["contexts"] == o["contexts"]


def test_shard_index_off_keeps_single_chip_classes(tmp_path):
    cfg = _config(
        tmp_path,
        tpu=TPUConfig(
            use_pallas=False,
            max_query_postings=2048,
            mesh_shape=[8],
            mesh_axis_names=["data"],
        ),
    )
    pipeline = EasyRAGPipeline(cfg)
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex

    assert isinstance(pipeline.sparse_retriever._resident, ResidentSparseIndex)
    assert pipeline._dual_scorer is not None
