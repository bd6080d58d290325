"""Native C++ index builder: bit-parity with the Python builder and a
build-speed sanity check."""

import time

import numpy as np
import pytest

from easyrag_tpu.index.sparse import build_sparse_index
from easyrag_tpu.native import build_index_native, native_available
from oracles import synthetic_corpus

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def test_native_matches_python_builder():
    corpus = synthetic_corpus(num_docs=120, vocab=140, seed=11)
    # include CJK tokens to exercise multibyte hashing
    corpus[0] = ["扩容", "虚机", "扩容", "步长"]
    corpus[1] = ["虚机", "备份"]
    py = build_sparse_index(corpus, bm25_type=0, use_native=False)
    nat = build_sparse_index(corpus, bm25_type=0, use_native=True)
    assert nat.stats.vocab == py.stats.vocab
    np.testing.assert_array_equal(nat.stats.doc_lens, py.stats.doc_lens)
    np.testing.assert_array_equal(nat.stats.term_offsets, py.stats.term_offsets)
    np.testing.assert_array_equal(nat.stats.post_docs, py.stats.post_docs)
    np.testing.assert_array_equal(nat.stats.post_tfs, py.stats.post_tfs)
    np.testing.assert_allclose(nat.post_vals, py.post_vals, rtol=1e-12)
    q = ["w3", "扩容", "unknown"]
    np.testing.assert_allclose(
        nat.get_scores_host(q), py.get_scores_host(q), rtol=1e-12
    )


def test_native_matches_python_builder_lucene():
    corpus = synthetic_corpus(num_docs=60, vocab=80, seed=5)
    py = build_sparse_index(corpus, bm25_type=1, use_native=False)
    nat = build_sparse_index(corpus, bm25_type=1, use_native=True)
    np.testing.assert_allclose(nat.post_vals, py.post_vals, rtol=1e-12)


def test_native_build_speed():
    corpus = synthetic_corpus(num_docs=3000, vocab=5000, seed=2, min_len=100, max_len=400)

    def best_of(fn, n=2):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    # comparative timing on a shared machine is inherently noisy (ROADMAP
    # "Robustness": one observed flake under heavy load) — retry the whole
    # comparison a few times before declaring the C++ core slow
    attempts = []
    for _ in range(3):
        t_native = best_of(lambda: build_index_native(corpus))
        t_python = best_of(lambda: build_sparse_index(corpus, use_native=False))
        attempts.append((t_native, t_python))
        # the C++ core must beat the python loop even counting the
        # flat-buffer marshalling; generous margin for timing noise
        if t_native < t_python * 1.2:
            return
    raise AssertionError(f"native build never beat python: {attempts}")


def test_empty_and_single_doc():
    nat = build_sparse_index([[]], use_native=True)
    assert nat.num_docs == 1 and nat.num_postings == 0
    nat2 = build_sparse_index([["a", "a", "b"]], use_native=True)
    assert nat2.num_postings == 2
    assert nat2.stats.vocab == {"a": 0, "b": 1}
