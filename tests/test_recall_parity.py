"""End-to-end recall parity: the full BM25Retriever stack (jieba + views +
resident device scoring) must rank exactly like a literal float64
re-implementation of the reference's retrieve()+filter() semantics."""

import numpy as np
import pytest

from easyrag_tpu.corpus.tokenizer import (
    JiebaTokenizer,
    default_stopwords,
    tokenize_and_remove_stopwords,
)
from easyrag_tpu.corpus.views import get_node_content
from easyrag_tpu.retrievers import BM25Retriever
from easyrag_tpu.schema import QueryBundle, TextNode
from oracles import OkapiOracle

WORDS = [
    "虚机", "扩容", "备份", "鉴权", "巡检", "升级", "配置", "日志", "网络",
    "存储", "数据库", "集群", "节点", "告警", "恢复", "容量", "性能", "监控",
    "步长", "上限",
]


@pytest.fixture(scope="module")
def corpus_nodes():
    rng = np.random.default_rng(42)
    nodes = []
    for i in range(80):
        words = rng.choice(WORDS, size=rng.integers(8, 30))
        text = f"文档{i}标题\n" + "，".join(words) + "。"
        nodes.append(
            TextNode(
                text=text,
                metadata={"dir": f"d{i % 4}", "know_path": f"包/{words[0]}/{i}"},
            )
        )
    return nodes


QUERIES = ["虚机扩容的上限和步长", "备份恢复配置", "鉴权日志在哪里", "集群节点告警监控"]


def _reference_retrieve(nodes, tokenizer, stopwords, query, top_k, embed_type,
                        filter_dict=None):
    """Literal float64 reimplementation of the reference's retrieval:
    tokenize corpus through the same view, BM25Okapi scores, argsort desc
    (stable proxy), drop score<=0, metadata filter, truncate."""
    corpus = [
        tokenize_and_remove_stopwords(tokenizer, get_node_content(n, embed_type), stopwords)
        for n in nodes
    ]
    oracle = OkapiOracle(corpus)
    q = tokenize_and_remove_stopwords(tokenizer, query, stopwords)
    scores = np.asarray(oracle.get_scores(q))
    order = scores.argsort(kind="stable")[::-1]
    out = []
    for ix in order:
        if scores[ix] <= 0:
            break
        if filter_dict and any(nodes[ix].metadata.get(k) != v for k, v in filter_dict.items()):
            continue
        out.append((int(ix), scores[ix]))
        if len(out) == top_k:
            break
    return out


def test_term_budget_overflow_falls_back_identically(corpus_nodes):
    """Queries with more distinct terms than the resident budget take the
    gather path and must rank identically."""
    tk = JiebaTokenizer()
    sw = default_stopwords()
    small = BM25Retriever(
        corpus_nodes, tk, sw, similarity_top_k=10, embed_type=0,
        use_pallas=False, max_query_terms=4,  # force overflow
    )
    big = BM25Retriever(
        corpus_nodes, tk, sw, similarity_top_k=10, embed_type=0,
        use_pallas=False, max_query_terms=64,
    )
    query = "虚机扩容备份鉴权巡检升级配置日志网络存储"  # many distinct terms
    a = small.retrieve(QueryBundle(query_str=query))
    b = big.retrieve(QueryBundle(query_str=query))
    # identical ranking; scores agree to f32 summation order (the resident
    # heavy/light split sums in a different order than the gather path)
    assert a and [id(n.node) for n in a] == [id(n.node) for n in b]
    np.testing.assert_allclose(
        [n.score for n in a], [n.score for n in b], rtol=1e-6
    )
    # batched form with one overflowing row also matches per-query results
    bundles = [QueryBundle(query_str=query), QueryBundle(query_str="备份恢复")]
    batch = small.retrieve_batch(bundles)
    singles = [small.retrieve(qb) for qb in bundles]
    for got, want in zip(batch, singles):
        assert [n.node.node_id for n in got] == [n.node.node_id for n in want]


def test_large_batch_stream_path_matches_per_query(corpus_nodes):
    """>64 queries route through the one-dispatch stream scorer; results
    (ordering, scores, per-row dir filters, overflow fallback) must be
    identical to per-query retrieve()."""
    tk = JiebaTokenizer()
    sw = default_stopwords()
    retriever = BM25Retriever(
        corpus_nodes, tk, sw, similarity_top_k=10, embed_type=0,
        use_pallas=False, max_query_terms=8,
    )
    base = QUERIES + ["虚机扩容备份鉴权巡检升级配置日志网络存储"]  # overflow row
    bundles = [QueryBundle(query_str=base[i % len(base)]) for i in range(70)]
    fds = [
        None if i % 3 == 0 else {"dir": f"d{i % 4}"} if i % 3 == 1 else {"dir": "nodir"}
        for i in range(70)
    ]
    batch = retriever.retrieve_batch(bundles, fds)
    for i, (qb, fd) in enumerate(zip(bundles, fds)):
        retriever.filter_dict = fd
        want = retriever.retrieve(qb)
        got = batch[i]
        assert [n.node.node_id for n in got] == [n.node.node_id for n in want], i
        np.testing.assert_allclose(
            [n.score for n in got], [n.score for n in want], rtol=1e-6
        )
    retriever.filter_dict = None


@pytest.mark.parametrize("embed_type", [0, 2])
def test_full_stack_recall_parity(corpus_nodes, embed_type):
    tk = JiebaTokenizer()
    sw = default_stopwords()
    retriever = BM25Retriever(
        corpus_nodes, tk, sw, similarity_top_k=15, embed_type=embed_type,
        use_pallas=False,
    )
    id_of = {n.node_id: i for i, n in enumerate(corpus_nodes)}
    for query in QUERIES:
        for fd in [None, {"dir": "d2"}]:
            retriever.filter_dict = fd
            got = [
                (id_of[n.node.node_id], n.score)
                for n in retriever.retrieve(QueryBundle(query_str=query))
            ]
            expected = _reference_retrieve(
                corpus_nodes, tk, sw, query, 15, embed_type, fd
            )
            assert [i for i, _ in got] == [i for i, _ in expected], (query, fd)
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in expected], rtol=1e-5
            )
