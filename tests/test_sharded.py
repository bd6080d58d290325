"""Multi-chip sharding parity on the 8-virtual-device CPU mesh: sharded
dense/sparse query results must equal the single-chip path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easyrag_tpu.index.dense import DenseIndex, l2_normalize
from easyrag_tpu.index.sparse import build_sparse_index
from easyrag_tpu.ops.bm25 import bm25_score_topk
from easyrag_tpu.parallel.mesh import data_model_mesh, make_mesh
from easyrag_tpu.parallel.sharded import ShardedDenseIndex, ShardedSparseScorer
from oracles import synthetic_corpus


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh([8], ("data",))


def test_make_mesh_shapes():
    m = data_model_mesh(8, model_parallel=2)
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        data_model_mesh(8, model_parallel=3)


def test_tp_embedder_matches_unsharded(mesh):
    """TP-sharded embedder params produce the same embeddings."""
    import jax.numpy as jnp

    from easyrag_tpu.models.layers import DecoderConfig, init_params
    from easyrag_tpu.models.qwen2 import embed_step
    from easyrag_tpu.parallel.mesh import data_model_mesh
    from easyrag_tpu.parallel.tp import shard_decoder_params

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        attention_bias=True, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.asarray(np.arange(3 * 12).reshape(3, 12) % 64, jnp.int32)
    mask = jnp.ones((3, 12), jnp.int32)
    ref = np.asarray(embed_step(cfg, params, ids, mask))

    m = data_model_mesh(8, model_parallel=2)
    sharded = shard_decoder_params(m, cfg, params, axis="model")
    with m:
        got = np.asarray(embed_step(cfg, sharded, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sharded_dense_matches_single_chip(mesh):
    rng = np.random.default_rng(0)
    n, d, b, k = 203, 64, 4, 17  # deliberately not divisible by 8
    matrix = l2_normalize(rng.normal(size=(n, d)).astype(np.float32))
    queries = l2_normalize(rng.normal(size=(b, d)).astype(np.float32))

    single = DenseIndex(matrix=jnp.asarray(matrix))
    from easyrag_tpu.index.dense import dense_score_topk

    sv, si = dense_score_topk(jnp.asarray(queries), single.matrix, k)

    sharded = ShardedDenseIndex(mesh, matrix, dtype=jnp.float32)
    mv, mi = sharded.query(queries, k)

    np.testing.assert_allclose(mv, np.asarray(sv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(mi, np.asarray(si))


def test_sharded_resident_matches_single_chip(mesh):
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex
    from easyrag_tpu.parallel.sharded import ShardedResidentSparseIndex

    corpus = synthetic_corpus(num_docs=137, vocab=80, seed=4)
    index = build_sparse_index(corpus, bm25_type=0)
    single = ResidentSparseIndex(index, light_cap=16, max_query_terms=16)
    sharded = ShardedResidentSparseIndex(mesh, index, light_cap=16, max_query_terms=16)
    queries = [["w3", "w14", "w15"], ["w0"], ["w9", "w9"], ["w1", "w2", "w5"], []]
    k = 11
    sv, si = single.score_topk(queries, k)
    mv, mi = sharded.score_topk(queries, k)
    for row in range(len(queries)):
        finite = np.isfinite(sv[row])
        np.testing.assert_allclose(mv[row][finite], sv[row][finite], rtol=1e-5)
        np.testing.assert_array_equal(mi[row][finite], si[row][finite])
        assert not np.isfinite(mv[row][~finite]).any()


def test_sharded_stream_matches_per_batch(mesh):
    """The sharded one-dispatch stream (scan around the shard_map) equals
    the sharded per-batch path, including dir filters and tail padding."""
    from easyrag_tpu.parallel.sharded import ShardedResidentSparseIndex

    corpus = synthetic_corpus(num_docs=101, vocab=70, seed=6)
    dirs = [f"d{i % 3}" for i in range(len(corpus))]
    index = build_sparse_index(corpus, bm25_type=0, dirs=dirs)
    sharded = ShardedResidentSparseIndex(mesh, index, light_cap=16, max_query_terms=16)
    queries = [["w3", "w14"], ["w1", "w2"], ["w0"], ["w9", "w9"], ["w5"]]
    dvals = ["d1", None, "zzz", None, "d2"]
    rv, ri = sharded.score_topk(queries, 9, dir_values=dvals)
    tv, ti = sharded.stream_score_topk(queries, 9, batch=2, dir_values=dvals)
    np.testing.assert_array_equal(ti, ri)
    np.testing.assert_array_equal(tv, rv)


def test_sharded_dir_filters_match_single_chip(mesh):
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex
    from easyrag_tpu.parallel.sharded import (
        ShardedDenseIndex,
        ShardedResidentSparseIndex,
    )

    rng = np.random.default_rng(5)
    corpus = synthetic_corpus(num_docs=101, vocab=70, seed=6)
    dirs = [f"d{i % 3}" for i in range(len(corpus))]
    index = build_sparse_index(corpus, bm25_type=0, dirs=dirs)
    single = ResidentSparseIndex(index, light_cap=16, max_query_terms=16)
    sharded = ShardedResidentSparseIndex(mesh, index, light_cap=16, max_query_terms=16)
    queries = [["w3", "w14"], ["w1", "w2"], ["w0"]]
    dvals = ["d1", None, "zzz"]
    sv, si = single.score_topk(queries, 9, dir_values=dvals)
    mv, mi = sharded.score_topk(queries, 9, dir_values=dvals)
    for row in range(len(queries)):
        finite = np.isfinite(sv[row])
        np.testing.assert_allclose(mv[row][finite], sv[row][finite], rtol=1e-5)
        np.testing.assert_array_equal(mi[row][finite], si[row][finite])
        assert not np.isfinite(mv[row][~finite]).any()

    # dense: filtered sharded == filtered single-chip
    from easyrag_tpu.index.dense import dense_score_topk, l2_normalize

    n, d = 101, 32
    matrix = l2_normalize(rng.normal(size=(n, d)).astype(np.float32))
    q = l2_normalize(rng.normal(size=(2, d)).astype(np.float32))
    dir_ids = np.array([i % 3 for i in range(n)], np.int32)
    sd = ShardedDenseIndex(mesh, matrix, dtype=jnp.float32, dir_ids=dir_ids)
    dir_f = np.array([1, -1], np.int32)
    mv2, mi2 = sd.query(q, 7, dir_filter=dir_f)
    sv2, si2 = dense_score_topk(
        jnp.asarray(q), jnp.asarray(matrix), 7,
        dir_col=jnp.asarray(dir_ids), dir_filter=jnp.asarray(dir_f),
    )
    np.testing.assert_allclose(mv2, np.asarray(sv2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(mi2, np.asarray(si2))


def test_sharded_sparse_matches_single_chip(mesh):
    corpus = synthetic_corpus(num_docs=97, vocab=120, seed=3)
    index = build_sparse_index(corpus, bm25_type=0)
    queries = [["w3", "w14", "w15"], ["w0"], ["w9", "w9"], ["w1", "w2", "w5"]]
    ids = np.stack(
        [index.gather_postings(index.query_term_ids(q), pad_to=2048)[0] for q in queries]
    )
    vals = np.stack(
        [index.gather_postings(index.query_term_ids(q), pad_to=2048)[1] for q in queries]
    )
    k = 13
    sv, si = bm25_score_topk(jnp.asarray(ids), jnp.asarray(vals), index.num_docs, k)

    scorer = ShardedSparseScorer(mesh, index.num_docs)
    mv, mi = scorer.score_topk(ids, vals, k)

    sv, si = np.asarray(sv), np.asarray(si)
    for row in range(len(queries)):
        finite = np.isfinite(sv[row])
        np.testing.assert_allclose(mv[row][finite], sv[row][finite], rtol=1e-5)
        np.testing.assert_array_equal(mi[row][finite], si[row][finite])
        # dropped entries are -inf on both paths
        assert not np.isfinite(mv[row][~finite]).any()


def test_sharded_int8_dense_matches_single_chip(mesh):
    """int8 rows + per-row scales shard without dequantization: scores are
    the single-chip int8 path's bit for bit (same q8, same row scales)."""
    from easyrag_tpu.index.dense import DenseIndex, l2_normalize
    from easyrag_tpu.parallel.sharded import ShardedDenseIndex

    rng = np.random.default_rng(11)
    n, d, k = 203, 64, 9
    emb = rng.normal(size=(n, d)).astype(np.float32)
    dirs = [f"d{i % 3}" for i in range(n)]
    single = DenseIndex.build(emb, dirs=dirs, dtype="int8")
    sharded = ShardedDenseIndex.build(mesh, emb, dirs=dirs, dtype="int8")
    assert sharded.matrix.dtype == jnp.int8  # rows stay quantized
    q = l2_normalize(rng.normal(size=(4, d)).astype(np.float32))
    sv, si = single.query(q, k)
    mv, mi = sharded.query(q, k)
    np.testing.assert_array_equal(np.asarray(mv), np.asarray(sv))
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(si))
    # streamed + dir-filtered form too
    dvals = ["d1", None, "zzz", "d0"]
    sv2, si2 = single.query_stream(q, k, dir_values=dvals, batch=2)
    mv2, mi2 = sharded.query_stream(q, k, dir_values=dvals, batch=2)
    np.testing.assert_array_equal(mv2, sv2)
    np.testing.assert_array_equal(mi2, si2)


def test_sharded_int8_sparse_heavy_matches_single_chip(mesh):
    """heavy_dtype=int8 on the sharded resident index: same global
    per-doc-column scales as single-chip -> identical scores."""
    from easyrag_tpu.index.sparse import build_sparse_index
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex
    from easyrag_tpu.parallel.sharded import ShardedResidentSparseIndex

    corpus = synthetic_corpus(num_docs=101, vocab=70, seed=12)
    dirs = [f"d{i % 3}" for i in range(len(corpus))]
    index = build_sparse_index(corpus, bm25_type=0, dirs=dirs)
    single = ResidentSparseIndex(
        index, light_cap=8, max_query_terms=16, heavy_dtype="int8"
    )
    sharded = ShardedResidentSparseIndex(
        mesh, index, light_cap=8, max_query_terms=16, heavy_dtype="int8"
    )
    queries = [["w3", "w14"], ["w1", "w2"], ["w0", "w5", "w9"]]
    dvals = ["d1", None, "zzz"]
    sv, si = single.score_topk(queries, 9, dir_values=dvals)
    mv, mi = sharded.score_topk(queries, 9, dir_values=dvals)
    for row in range(len(queries)):
        finite = np.isfinite(sv[row])
        np.testing.assert_allclose(mv[row][finite], sv[row][finite], rtol=1e-6)
        np.testing.assert_array_equal(mi[row][finite], si[row][finite])
        assert not np.isfinite(mv[row][~finite]).any()
    # stream form
    sv2, si2 = single.stream_score_topk(queries, 9, batch=2, dir_values=dvals)
    mv2, mi2 = sharded.stream_score_topk(queries, 9, batch=2, dir_values=dvals)
    for row in range(len(queries)):
        finite = np.isfinite(sv2[row])
        np.testing.assert_allclose(mv2[row][finite], sv2[row][finite], rtol=1e-6)
        np.testing.assert_array_equal(mi2[row][finite], si2[row][finite])


def test_sharded_dense_load_matches_dense_load(mesh, tmp_path):
    """ShardedDenseIndex.load reads the DenseIndex artifact host-side and
    returns the same results, without materializing on one device."""
    from easyrag_tpu.index.dense import DenseIndex, l2_normalize
    from easyrag_tpu.parallel.sharded import ShardedDenseIndex

    rng = np.random.default_rng(13)
    n, d, k = 77, 32, 5
    emb = rng.normal(size=(n, d)).astype(np.float32)
    single = DenseIndex.build(emb, dirs=[f"d{i % 2}" for i in range(n)], dtype="float32")
    single.save(str(tmp_path / "art"))
    loaded = ShardedDenseIndex.load(mesh, str(tmp_path / "art"))
    assert loaded.num_docs == n and loaded.dir_vocab == single.dir_vocab
    q = l2_normalize(rng.normal(size=(2, d)).astype(np.float32))
    sv, si = single.query(q, k)
    mv, mi = loaded.query(q, k)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(sv), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(si))


def test_sharded_mixed_light_heavy_matches_single_chip(mesh):
    """Sharded sparse scoring == single-chip on a corpus with real light
    AND heavy mass, in both light layouts (rows + CSR) and the stream
    form — the sharded rows/prefix port's non-vacuous parity gate."""
    from easyrag_tpu.index.sparse import build_sparse_index
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex
    from easyrag_tpu.parallel.sharded import ShardedResidentSparseIndex

    corpus = synthetic_corpus(num_docs=150, vocab=300, seed=9)
    dirs = [f"d{i % 3}" for i in range(len(corpus))]
    index = build_sparse_index(corpus, bm25_type=0, dirs=dirs)
    lens = np.diff(index.stats.term_offsets)
    assert ((lens > 0) & (lens <= 16)).sum() > 50 and (lens > 16).sum() > 20

    rng = np.random.default_rng(7)
    queries = []
    for _ in range(9):
        doc = corpus[rng.integers(0, len(corpus))]
        take = rng.choice(len(doc), size=min(8, len(doc)), replace=False)
        queries.append([doc[i] for i in take])
    dvals = ["d1", None, "zzz"] * 3

    single = ResidentSparseIndex(index, light_cap=16, max_query_terms=16)
    for light_rows in (True, False):
        sharded = ShardedResidentSparseIndex(
            mesh, index, light_cap=16, max_query_terms=16,
            light_rows=light_rows,
        )
        ids, _ = sharded.query_terms_batch(queries)
        assert (sharded._host_light_lens[ids] > 0).any()  # non-vacuous
        sv, si = single.score_topk(queries, 9, dir_values=dvals)
        mv, mi = sharded.score_topk(queries, 9, dir_values=dvals)
        for row in range(len(queries)):
            finite = np.isfinite(sv[row])
            np.testing.assert_allclose(
                mv[row][finite], sv[row][finite], rtol=1e-5
            )
            np.testing.assert_array_equal(mi[row][finite], si[row][finite])
            assert not np.isfinite(mv[row][~finite]).any()
        sv2, si2 = single.stream_score_topk(
            queries, 9, batch=4, dir_values=dvals
        )
        mv2, mi2 = sharded.stream_score_topk(
            queries, 9, batch=4, dir_values=dvals
        )
        for row in range(len(queries)):
            finite = np.isfinite(sv2[row])
            np.testing.assert_allclose(
                mv2[row][finite], sv2[row][finite], rtol=1e-5
            )
            np.testing.assert_array_equal(mi2[row][finite], si2[row][finite])
            assert not np.isfinite(mv2[row][~finite]).any()
