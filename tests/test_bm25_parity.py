"""Exact-score parity: packed SparseIndex vs clean-room oracles, host vs
device paths, and the reference's argsort tie ordering.

The vendored fixture ``fixtures/bm25_goldens.json`` breaks the
oracle-vs-oracle symmetry: its score tables are literal numbers committed to
git (hand-derived from the published algorithms here; regenerated from the
REAL rank_bm25/bm25s/jieba via ``tools/gen_bm25_goldens.py`` wherever those
libraries exist), so a shared misreading of
``src/easyrag/custom/retrievers.py:103-118`` in both the index and
``tests/oracles.py`` cannot silently pass."""

import json
import os

import numpy as np
import pytest

from easyrag_tpu.index.sparse import build_sparse_index
from oracles import OkapiOracle, LuceneOracle, synthetic_corpus

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "bm25_goldens.json")


@pytest.fixture(scope="module")
def goldens():
    with open(_FIXTURE, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def corpus():
    return synthetic_corpus(num_docs=96, vocab=150, seed=7)


QUERIES = [
    ["w3", "w14", "w15"],
    ["w0"],
    ["w9", "w9", "w9"],  # duplicate query tokens must sum per occurrence
    ["unknown_token"],
    ["w1", "unknown_token", "w2"],
    [],
]


def test_okapi_host_parity(corpus):
    oracle = OkapiOracle(corpus)
    index = build_sparse_index(corpus, bm25_type=0)
    for q in QUERIES:
        expected = np.array(oracle.get_scores(q))
        got = index.get_scores_host(q)
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_lucene_host_parity(corpus):
    oracle = LuceneOracle(corpus)
    index = build_sparse_index(corpus, bm25_type=1)
    for q in QUERIES:
        expected = np.array(oracle.get_scores(q))
        got = index.get_scores_host(q)
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_okapi_vendored_goldens(goldens):
    """Packed index vs vendored literal scores: epsilon-floor (incl. the
    NEGATIVE-floor quirk when avg_idf < 0), duplicate query tokens, tf > 1,
    unknown tokens, empty query."""
    for case in goldens["okapi"]["cases"]:
        index = build_sparse_index(case["corpus"], bm25_type=0)
        oracle = OkapiOracle(case["corpus"])
        for q, expected in zip(case["queries"], case["scores"]):
            np.testing.assert_allclose(
                index.get_scores_host(q), expected, rtol=1e-12, atol=1e-12,
                err_msg=f"case={case['name']} q={q}",
            )
            # the clean-room oracle must match the vendored numbers too —
            # drift in oracles.py gets caught against the pinned fixture
            np.testing.assert_allclose(
                oracle.get_scores(q), expected, rtol=1e-12, atol=1e-12
            )


def test_lucene_vendored_goldens(goldens):
    for case in goldens["lucene"]["cases"]:
        index = build_sparse_index(case["corpus"], bm25_type=1)
        oracle = LuceneOracle(case["corpus"])
        for q, expected in zip(case["queries"], case["scores"]):
            np.testing.assert_allclose(
                index.get_scores_host(q), expected, rtol=1e-12, atol=1e-12,
                err_msg=f"case={case['name']} q={q}",
            )
            np.testing.assert_allclose(
                oracle.get_scores(q), expected, rtol=1e-12, atol=1e-12
            )


def test_okapi_negative_floor_quirk_is_exercised(goldens):
    """Guard: the first okapi fixture case must keep avg_idf < 0 so the
    epsilon 'floor' is NEGATIVE (rank_bm25 multiplies epsilon by the mean of
    raw IDFs — with a dominant high-df token that mean can be negative)."""
    case = goldens["okapi"]["cases"][0]
    oracle = OkapiOracle(case["corpus"])
    assert oracle.idf["a"] < 0  # floored value stays negative
    scores = np.asarray(case["scores"][0])  # query ["a"]
    assert (scores < 0).all()


def test_jieba_vendored_goldens(goldens):
    """JiebaTokenizer output vs goldens generated from the real jieba
    library (the reference tokenizer, retrievers.py:72-76)."""
    from easyrag_tpu.corpus.tokenizer import JiebaTokenizer

    tk = JiebaTokenizer()
    for text, expected in goldens["jieba"].items():
        assert tk.cut(text) == expected, text


def test_okapi_epsilon_floor_applies():
    # a token present in nearly all docs gets a negative raw IDF -> floored
    corpus = [["common", f"rare{i}"] for i in range(20)]
    oracle = OkapiOracle(corpus)
    index = build_sparse_index(corpus, bm25_type=0)
    scores = index.get_scores_host(["common"])
    expected = np.array(oracle.get_scores(["common"]))
    assert (expected > 0).all()  # floor turned negative idf positive
    np.testing.assert_allclose(scores, expected, rtol=1e-12)


def test_device_scatter_matches_host(corpus):
    import jax.numpy as jnp

    from easyrag_tpu.ops.bm25 import bm25_scores

    index = build_sparse_index(corpus, bm25_type=0)
    for q in QUERIES:
        ids, vals = index.gather_postings(index.query_term_ids(q), pad_to=4096)
        dev = np.asarray(bm25_scores(jnp.asarray(ids), jnp.asarray(vals), index.num_docs))
        host = index.get_scores_host(q)
        np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)


def test_pallas_kernel_matches_host(corpus):
    import jax.numpy as jnp

    from easyrag_tpu.ops.bm25_pallas import bm25_scores_pallas

    index = build_sparse_index(corpus, bm25_type=0)
    for q in QUERIES:
        ids, vals = index.gather_postings(index.query_term_ids(q), pad_to=2048)
        dev = np.asarray(
            bm25_scores_pallas(
                jnp.asarray(ids), jnp.asarray(vals), index.num_docs, interpret=True
            )
        )
        host = index.get_scores_host(q)
        np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)


def test_topk_reference_tie_order():
    import jax.numpy as jnp

    from easyrag_tpu.ops.topk import topk_desc_reference_order

    rng = np.random.default_rng(0)
    # force many ties
    scores = rng.integers(0, 5, size=200).astype(np.float32)
    # our deterministic tie policy: stable ascending argsort, reversed
    ref_order = scores.argsort(kind="stable")[::-1]
    vals, idx = topk_desc_reference_order(jnp.asarray(scores), 50)
    np.testing.assert_array_equal(np.asarray(idx), ref_order[:50])
    np.testing.assert_array_equal(np.asarray(vals), scores[ref_order[:50]])
    # and score values agree with the reference's (unstable) argsort ranking
    unstable = scores.argsort()[::-1]
    np.testing.assert_array_equal(scores[unstable[:50]], np.asarray(vals))


def test_two_stage_topk_bit_identical():
    """The chunked two-stage top-k must match the single-stage flip-trick
    path bit-for-bit — including heavy ties, all--inf rows, and -inf
    interleaved with ties (the dir-filter regime)."""
    import jax.numpy as jnp

    import easyrag_tpu.ops.topk as topk_mod
    from easyrag_tpu.ops.topk import _pick_chunks, topk_desc_reference_order

    n, k = 8192, 288
    assert _pick_chunks(n, k) > 1  # the case below really takes 2-stage
    rng = np.random.default_rng(3)
    scores = rng.integers(0, 7, size=(5, n)).astype(np.float32)  # many ties
    scores[1] = -np.inf  # fully filtered row
    scores[2, rng.integers(0, n, 6000)] = -np.inf  # mostly filtered
    scores[3] = 1.0  # one global tie

    v2, i2 = topk_desc_reference_order(jnp.asarray(scores), k)
    # force the single-stage path for the oracle
    orig = topk_mod._pick_chunks
    topk_mod._pick_chunks = lambda n_, k_: 1
    try:
        v1, i1 = topk_desc_reference_order(jnp.asarray(scores), k)
    finally:
        topk_mod._pick_chunks = orig
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    # and both equal the numpy stable-descending reference
    ref_order = scores.argsort(axis=1, kind="stable")[:, ::-1][:, :k]
    np.testing.assert_array_equal(np.asarray(i1), ref_order)


def test_score_topk_filter_semantics(corpus):
    """bm25_score_topk must reproduce the reference filter(): argsort desc,
    drop score<=0, dir equality filter, truncate to top-k."""
    import jax.numpy as jnp

    from easyrag_tpu.ops.bm25 import bm25_score_topk

    dirs = [f"d{i % 3}" for i in range(len(corpus))]
    index = build_sparse_index(corpus, bm25_type=0, dirs=dirs)
    q = ["w3", "w14", "w15"]
    ids, vals = index.gather_postings(index.query_term_ids(q), pad_to=4096)
    scores = index.get_scores_host(q)

    def reference_filter(scores, topk, dir_value=None):
        order = scores.argsort()[::-1]
        out = []
        for ix in order:
            if scores[ix] <= 0:
                break
            if dir_value is not None and dirs[ix] != dir_value:
                continue
            out.append((ix, scores[ix]))
            if len(out) == topk:
                break
        return out

    for dir_value in [None, "d1"]:
        dir_f = jnp.int32(index.dir_vocab[dir_value]) if dir_value else jnp.int32(-1)
        k = 10
        top_vals, top_idx = bm25_score_topk(
            jnp.asarray(ids),
            jnp.asarray(vals),
            index.num_docs,
            k,
            dir_col=jnp.asarray(index.dir_ids),
            dir_filter=dir_f,
        )
        expected = reference_filter(scores, k, dir_value)
        got = [
            (int(i), float(v))
            for i, v in zip(np.asarray(top_idx), np.asarray(top_vals))
            if np.isfinite(v)
        ]
        assert [i for i, _ in got] == [i for i, _ in expected]
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in expected], rtol=1e-6
        )


def test_packed_postings_roundtrip(corpus):
    import jax.numpy as jnp

    from easyrag_tpu.ops.bm25 import bm25_score_topk, pack_postings

    index = build_sparse_index(corpus, bm25_type=0)
    qs = [["w3", "w14", "w15"], ["w0"]]
    ids = np.stack(
        [index.gather_postings(index.query_term_ids(q), pad_to=2048)[0] for q in qs]
    )
    vals = np.stack(
        [index.gather_postings(index.query_term_ids(q), pad_to=2048)[1] for q in qs]
    )
    plain = bm25_score_topk(jnp.asarray(ids), jnp.asarray(vals), index.num_docs, 10)
    packed = bm25_score_topk(
        jnp.asarray(pack_postings(ids, vals)), None, index.num_docs, 10
    )
    np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(packed[0]))
    np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(packed[1]))


def test_sparse_index_save_load(tmp_path, corpus):
    from easyrag_tpu.index.sparse import load_sparse_index, save_sparse_index

    index = build_sparse_index(corpus, bm25_type=0, dirs=["a"] * len(corpus))
    save_sparse_index(index, str(tmp_path))
    loaded = load_sparse_index(str(tmp_path))
    q = ["w3", "w14"]
    np.testing.assert_allclose(
        loaded.get_scores_host(q), index.get_scores_host(q), rtol=1e-12
    )
    assert loaded.dir_vocab == index.dir_vocab
