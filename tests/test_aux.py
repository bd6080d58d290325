"""Aux subsystems: eval metrics, qa IO, auto-merging retrieval, sentence
cutting, HyDE flow, event hooks, submit payloads."""

import asyncio
import json

import numpy as np

from easyrag_tpu.automerge import AutoMergingRetriever
from easyrag_tpu.eval import keyword_accuracy, read_jsonl, retrieval_recall, save_answers, write_jsonl
from easyrag_tpu.generation import CompletionResponse, HyDETransform, cut_sent, deduplicate
from easyrag_tpu.schema import NodeRelationship, NodeWithScore, QueryBundle, TextNode
from easyrag_tpu.utils.events import emit, on


def test_jsonl_roundtrip(tmp_path):
    rows = [{"id": 1, "query": "问", "answer": "答"}, {"id": 2, "query": "q"}]
    path = str(tmp_path / "x.jsonl")
    write_jsonl(path, rows)
    assert read_jsonl(path) == rows


def test_save_answers_and_keyword_accuracy(tmp_path):
    queries = [
        {"id": 1, "query": "q1", "keywords": ["15", "步长"], "answer": "gt"},
        {"id": 2, "query": "q2", "keywords": ["LDAP"], "answer": "gt"},
    ]
    answers = save_answers(queries, ["个数为15", "未知"], str(tmp_path / "a.jsonl"))
    assert answers[0] == {"id": 1, "query": "q1", "answer": "个数为15"}
    # q1: 1/2 keywords hit; q2: 0/1 -> mean 0.25
    assert keyword_accuracy(answers, queries) == 0.25


def test_retrieval_recall():
    retrieved = [["a", "b", "c"], ["x", "y"]]
    gold = ["b", "z"]
    assert retrieval_recall(retrieved, gold, k=2) == 0.5
    assert retrieval_recall(retrieved, gold, k=1) == 0.0


def test_cut_sent_rules():
    text = "第一句。第二句！第三句？Ellipsis......后续"
    parts = cut_sent(text)
    assert parts[0] == "第一句。"
    assert parts[1] == "第二句！"
    assert parts[2] == "第三句？"
    assert any("......" in p for p in parts)
    # terminator inside closing quote: break goes after the quote
    parts2 = cut_sent("他说“好了。”然后离开。")
    assert parts2[0].endswith("”")


def test_deduplicate_order_preserving():
    assert deduplicate(["a", "b", "a", "c", "b"]) == ["a", "b", "c"]


def test_automerge_promotes_parent():
    parent = TextNode(text="PARENT")
    children = [TextNode(text=f"c{i}") for i in range(4)]
    for c in children:
        c.relationships[NodeRelationship.PARENT] = parent.node_id
    parent.relationships[NodeRelationship.CHILD] = [c.node_id for c in children]
    lone = TextNode(text="lone")
    all_nodes = [parent, *children, lone]

    class FakeBase:
        filter_dict = None

        def retrieve(self, qb):
            # 3 of 4 children retrieved (ratio 0.75 > 0.4) + the lone node
            return [
                NodeWithScore(node=children[0], score=3.0),
                NodeWithScore(node=children[1], score=2.0),
                NodeWithScore(node=children[2], score=1.0),
                NodeWithScore(node=lone, score=2.5),
            ]

    am = AutoMergingRetriever(FakeBase(), all_nodes, simple_ratio_thresh=0.4)
    out = am.retrieve(QueryBundle(query_str="q"))
    texts = [n.node.text for n in out]
    assert "PARENT" in texts and "c0" not in texts
    # parent score = mean(3,2,1) = 2.0; sorted desc: lone(2.5) first
    assert texts[0] == "lone"
    assert out[1].score == 2.0


def test_automerge_below_threshold_keeps_children():
    parent = TextNode(text="PARENT")
    children = [TextNode(text=f"c{i}") for i in range(4)]
    for c in children:
        c.relationships[NodeRelationship.PARENT] = parent.node_id
    parent.relationships[NodeRelationship.CHILD] = [c.node_id for c in children]

    class FakeBase:
        filter_dict = None

        def retrieve(self, qb):
            return [NodeWithScore(node=children[0], score=1.0)]  # ratio 0.25

    am = AutoMergingRetriever(FakeBase(), [parent, *children], simple_ratio_thresh=0.4)
    out = am.retrieve(QueryBundle(query_str="q"))
    assert [n.node.text for n in out] == ["c0"]


def test_hyde_transform_bundle():
    class FakeLLM:
        async def acomplete(self, prompt):
            assert "问题X" in prompt
            return CompletionResponse(text="伪文档")

    hyde = HyDETransform(FakeLLM(), "上下文:{context_str}", include_original=True)
    bundle = asyncio.new_event_loop().run_until_complete(hyde.acall("问题X"))
    assert bundle.custom_embedding_strs == ["伪文档", "问题X"]
    assert bundle.query_str == "问题X"


def test_event_hooks():
    seen = []
    off = on(lambda kind, payload: seen.append((kind, payload)))
    emit("unit", {"x": 1})
    off()
    emit("unit", {"x": 2})
    assert seen == [("unit", {"x": 1})]


def test_submit_payload_format(monkeypatch):
    from easyrag_tpu import submit as submit_mod

    captured = {}

    class FakeResp:
        def read(self):
            return b"ok"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        captured["url"] = req.full_url
        captured["data"] = req.data
        captured["headers"] = dict(req.headers)
        return FakeResp()

    monkeypatch.setattr(submit_mod.urllib.request, "urlopen", fake_urlopen)
    out = submit_mod.submit(
        [{"id": 1, "answer": "中文"}], judge_url="http://judge", contest="c", ticket="t"
    )
    assert out == "ok"
    assert captured["url"] == "http://judge/submit"
    assert json.loads(captured["data"].decode("utf-8")) == {"id": 1, "answer": "中文"}
    assert captured["headers"]["Contest"] == "c"
