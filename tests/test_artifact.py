"""Corpus artifact: save/load roundtrip and pipeline fast boot."""

import asyncio
import json

import numpy as np

from easyrag_tpu.config import EasyRAGConfig, TPUConfig
from easyrag_tpu.index.artifact import CorpusArtifact, load_nodes, save_nodes
from easyrag_tpu.pipeline import EasyRAGPipeline
from easyrag_tpu.schema import NodeRelationship, TextNode
from easyrag_tpu.utils import run_sync


def test_nodes_jsonl_roundtrip(tmp_path):
    a = TextNode(text="甲", metadata={"dir": "d", "file_path": "d/a.txt"})
    b = TextNode(text="乙", metadata={"dir": "d"})
    b.relationships[NodeRelationship.PREVIOUS] = a.node_id
    a.relationships[NodeRelationship.CHILD] = [b.node_id]
    path = str(tmp_path / "nodes.jsonl")
    save_nodes([a, b], path)
    loaded = load_nodes(path)
    assert loaded[0].node_id == a.node_id
    assert loaded[0].metadata == a.metadata
    assert loaded[1].relationships[NodeRelationship.PREVIOUS] == a.node_id
    assert loaded[0].relationships[NodeRelationship.CHILD] == [b.node_id]


def _corpus(tmp_path):
    root = tmp_path / "corpus"
    (root / "director").mkdir(parents=True)
    (root / "director" / "a.txt").write_text(
        "标题\nCDU虚机每次扩容的最大SC个数为15。\n", encoding="utf-8"
    )
    (root / "director" / "b.txt").write_text(
        "备份\n系统支持全量备份和增量备份。\n", encoding="utf-8"
    )
    # a third doc keeps okapi IDFs positive for df=1 terms (at N=2 the IDF
    # of a df=1 term is exactly 0 and everything is filtered at score<=0)
    (root / "director" / "c.txt").write_text(
        "鉴权\n用户鉴权失败时检查LDAP连接。\n", encoding="utf-8"
    )
    (root / "pathmap.json").write_text(
        json.dumps(
            {
                "director/a.txt": ["运维", "扩容"],
                "director/b.txt": ["运维", "备份"],
                "director/c.txt": ["安全", "鉴权"],
            }
        ),
        encoding="utf-8",
    )
    return str(root)


def test_pipeline_artifact_fast_boot(tmp_path):
    cfg = EasyRAGConfig(
        re_only=True,
        retrieval_type=2,
        use_reranker=0,
        chunk_size=64,
        chunk_overlap=10,
        data_path=_corpus(tmp_path),
        f_topk_2=4,
        f_topk_3=1,
        index_artifact_path=str(tmp_path / "artifact"),
        tpu=TPUConfig(use_pallas=False, max_query_postings=1024),
    )
    p1 = EasyRAGPipeline(cfg)
    art = CorpusArtifact(cfg.index_artifact_path)
    assert art.exists()

    # boot again from the artifact: documents are not re-read (tracked via
    # a read_data monkeypatch-by-event) and results are identical
    events = []
    from easyrag_tpu.utils.events import on

    off = on(lambda kind, payload: events.append(kind))
    p2 = EasyRAGPipeline(cfg)
    off()
    assert "artifact" in events and "ingestion" not in events
    q = {"query": "CDU扩容个数"}
    r1 = run_sync(p1.run(dict(q)))
    r2 = run_sync(p2.run(dict(q)))
    assert r1["contexts"] == r2["contexts"]
    assert r1["contexts"]  # non-empty

    # corpus content change invalidates the cache -> rebuild from disk
    # (the reference's reuse-if-populated qdrant check would serve stale)
    import os

    os.remove(os.path.join(cfg.data_path, "director", "a.txt"))
    p3 = EasyRAGPipeline(cfg)
    r3 = run_sync(p3.run(dict(q)))
    assert all("CDU" not in c for c in r3["contexts"])

    # changing a fingerprint knob also invalidates
    cfg2 = EasyRAGConfig(**{**cfg.to_dict(), "chunk_size": 32, "tpu": cfg.tpu})
    events2 = []
    off = on(lambda kind, payload: events2.append(kind))
    EasyRAGPipeline(cfg2)
    off()
    assert "ingestion" in events2  # rebuilt, not loaded
