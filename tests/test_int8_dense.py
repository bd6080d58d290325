"""int8 dense index: recall vs the f32 ranking, artifact roundtrip."""

import numpy as np

from easyrag_tpu.index.dense import DenseIndex, l2_normalize


def _setup(n=400, d=64, b=6, seed=0):
    rng = np.random.default_rng(seed)
    matrix = l2_normalize(rng.normal(size=(n, d)).astype(np.float32))
    queries = l2_normalize(rng.normal(size=(b, d)).astype(np.float32))
    return matrix, queries


def test_int8_recall_vs_f32():
    matrix, queries = _setup()
    k = 20
    f32 = DenseIndex.build(matrix, dtype="float32")
    i8 = DenseIndex.build(matrix, dtype="int8")
    assert i8.matrix.dtype == np.dtype("int8") and i8.scales is not None
    _, idx32 = f32.query(queries, k)
    _, idx8 = i8.query(queries, k)
    recall = np.mean(
        [len(set(idx32[r]) & set(idx8[r])) / k for r in range(len(queries))]
    )
    assert recall >= 0.9, recall  # int8 symmetric quant keeps top-k recall high


def test_int8_scores_close_to_f32():
    matrix, queries = _setup(n=100)
    f32 = DenseIndex.build(matrix, dtype="float32")
    i8 = DenseIndex.build(matrix, dtype="int8")
    v32, _ = f32.query(queries, 5)
    v8, _ = i8.query(queries, 5)
    np.testing.assert_allclose(v8, v32, atol=0.03)


def test_int8_artifact_roundtrip(tmp_path):
    matrix, queries = _setup(n=120)
    i8 = DenseIndex.build(matrix, dirs=["a"] * 120, dtype="int8")
    i8.save(str(tmp_path))
    loaded = DenseIndex.load(str(tmp_path))
    assert loaded.matrix.dtype == np.dtype("int8")
    v1, x1 = i8.query(queries, 7)
    v2, x2 = loaded.query(queries, 7)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    assert loaded.dir_vocab == {"a": 0}


def test_dense_stream_matches_row_wise():
    """query_stream (one-dispatch scan) equals per-row query(), including
    per-row dir filters and tail padding, on both f32 and int8 indexes."""
    import numpy as np

    rng = np.random.default_rng(3)
    matrix = rng.normal(size=(90, 24)).astype(np.float32)
    dirs = [f"d{i % 3}" for i in range(90)]
    qs = rng.normal(size=(5, 24)).astype(np.float32)
    dvals = ["d1", None, "zzz", "d0", None]
    for dtype in ("float32", "int8"):
        idx = DenseIndex.build(matrix, dirs=dirs, dtype=dtype)
        sv, si = idx.query_stream(qs, 7, dir_values=dvals, batch=2)
        for row in range(5):
            rv, ri = idx.query(qs[row], 7, dir_value=dvals[row])
            np.testing.assert_array_equal(si[row], ri[0])
            # scores to f32 tolerance: the batched matmul tiles (and thus
            # accumulates) differently than the single-row one
            np.testing.assert_allclose(sv[row], rv[0], rtol=1e-6)


def test_empty_dense_query_stream():
    import numpy as np
    from easyrag_tpu.index.dense import DenseIndex

    rng = np.random.default_rng(0)
    idx = DenseIndex.build(rng.normal(size=(50, 16)).astype(np.float32))
    v, i = idx.query_stream(np.zeros((0, 16), np.float32), 5)
    assert v.shape == (0, 5) and i.shape == (0, 5)
