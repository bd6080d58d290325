"""Device-resident sparse index: exact parity with the host oracle, heavy/
light split correctness, dir filter semantics."""

import numpy as np
import pytest

from easyrag_tpu.index.sparse import build_sparse_index
from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex
from oracles import synthetic_corpus


@pytest.fixture(scope="module")
def setup():
    # small light_cap forces several terms into the heavy matrix
    corpus = synthetic_corpus(num_docs=150, vocab=60, seed=9)
    dirs = [f"d{i % 3}" for i in range(len(corpus))]
    index = build_sparse_index(corpus, bm25_type=0, dirs=dirs)
    resident = ResidentSparseIndex(index, light_cap=32, max_query_terms=16)
    return corpus, index, resident, dirs


def test_heavy_light_split(setup):
    _, index, resident, _ = setup
    lens = np.diff(index.stats.term_offsets)
    n_heavy = int((lens > 32).sum())
    assert n_heavy > 0  # the fixture must actually exercise the matmul path
    assert (np.asarray(resident.t_heavy_row) >= 0).sum() == n_heavy
    # light lens zeroed exactly for heavy terms
    light = np.asarray(resident.t_light_lens)[: resident.V]
    assert ((light == 0) == (lens > 32)).all() or (light[lens > 32] == 0).all()


def test_resident_matches_host_oracle(setup):
    _, index, resident, _ = setup
    queries = [
        ["w3", "w14", "w15"],
        ["w0"],
        ["w9", "w9", "w9"],  # duplicates -> counts
        ["w1", "unknown", "w2"],
        [],
    ]
    k = 20
    tv, ti = resident.score_topk(queries, k)
    for row, q in enumerate(queries):
        host = index.get_scores_host(q)
        order = host.argsort(kind="stable")[::-1]
        expected = [(int(i), host[i]) for i in order if host[i] > 0][:k]
        got = [
            (int(i), float(v)) for i, v in zip(ti[row], tv[row]) if np.isfinite(v)
        ]
        assert [i for i, _ in got] == [i for i, _ in expected], q
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in expected], rtol=1e-5
        )


def test_resident_dir_filter(setup):
    _, index, resident, dirs = setup
    q = ["w3", "w14", "w15"]
    tv, ti = resident.score_topk([q, q, q], 15, dir_values=["d1", None, "nodir"])
    host = index.get_scores_host(q)
    # row 0: only d1 docs
    got0 = [int(i) for i, v in zip(ti[0], tv[0]) if np.isfinite(v)]
    assert got0 and all(dirs[i] == "d1" for i in got0)
    # row 1: unfiltered == host order
    order = host.argsort(kind="stable")[::-1]
    expected = [int(i) for i in order if host[i] > 0][:15]
    got1 = [int(i) for i, v in zip(ti[1], tv[1]) if np.isfinite(v)]
    assert got1 == expected
    # row 2: unknown dir -> nothing
    assert not np.isfinite(tv[2]).any()


def test_stream_matches_per_batch(setup):
    """The one-dispatch scan-over-batches path is bit-identical to the
    per-batch dispatch path, including dir filters and tail padding."""
    _, _, resident, _ = setup
    queries = [
        ["w3", "w14", "w15"],
        ["w0"],
        ["w9", "w9"],
        ["w1", "w2"],
        ["w5", "w7", "w11"],
    ]
    dir_values = ["d1", None, None, "nodir", "d2"]
    ref_tv, ref_ti = resident.score_topk(queries, 15, dir_values=dir_values)
    # batch=2 over 5 queries: 3 scan steps with a padded tail row
    tv, ti = resident.stream_score_topk(
        queries, 15, batch=2, dir_values=dir_values
    )
    np.testing.assert_array_equal(ti, ref_ti)
    np.testing.assert_array_equal(tv, ref_tv)


def test_pallas_tail_matches_xla(setup):
    """The one-hot-matmul light tail (interpret mode on CPU) ranks exactly
    like the XLA scatter-add tail; scores agree to f32 summation order."""
    _, index, exact, _ = setup
    pallas = ResidentSparseIndex(
        index, light_cap=32, max_query_terms=16, tail="pallas_interpret"
    )
    queries = [["w3", "w14", "w15"], ["w0"], ["w9", "w9", "w1"], []]
    tv0, ti0 = exact.score_topk(queries, 12)
    tv1, ti1 = pallas.score_topk(queries, 12)
    np.testing.assert_array_equal(ti1, ti0)
    both = np.isfinite(tv0)
    np.testing.assert_allclose(tv1[both], tv0[both], rtol=1e-6)


@pytest.mark.parametrize("dtype,rtol,min_overlap", [
    ("bfloat16", 6e-3, 9),
    ("int8", 3e-2, 8),
])
def test_quantized_heavy_close_to_exact(setup, dtype, rtol, min_overlap):
    """Opt-in compressed heavy matrices (2x / 4x HBM headroom for large
    corpora) keep scores within quantization error and top-k membership
    nearly intact; the light gather tail stays exact f32."""
    corpus, index, exact, _ = setup
    quant = ResidentSparseIndex(
        index, light_cap=2, max_query_terms=16, heavy_dtype=dtype
    )
    queries = [["w3", "w14", "w15"], ["w0", "w5"], ["w9", "w9", "w1"]]
    tv0, ti0 = exact.score_topk(queries, 10)
    tv1, ti1 = quant.score_topk(queries, 10)
    for row in range(len(queries)):
        keep0 = {int(i) for i, v in zip(ti0[row], tv0[row]) if np.isfinite(v)}
        keep1 = {int(i) for i, v in zip(ti1[row], tv1[row]) if np.isfinite(v)}
        assert len(keep0 & keep1) >= min(min_overlap, len(keep0))
        both = np.isfinite(tv0[row]) & np.isfinite(tv1[row])
        np.testing.assert_allclose(tv1[row][both], tv0[row][both], rtol=rtol)
    # dual-route and stream paths thread the scales too
    tvs, tis = quant.stream_score_topk(queries, 10, batch=2)
    np.testing.assert_array_equal(tis, ti1)


def test_int8_auto_light_cap_gets_headroom(setup):
    """At the same HBM budget the int8 heavy matrix admits a light_cap at
    most that of f32 (4 bytes/entry -> 1)."""
    _, index, _, _ = setup
    budget = 40_000  # bytes; small enough to force the auto loop to move
    f32 = ResidentSparseIndex(index, heavy_hbm_budget=budget)
    i8 = ResidentSparseIndex(
        index, heavy_hbm_budget=budget, heavy_dtype="int8"
    )
    assert i8.light_cap <= f32.light_cap


def test_stream_checksum_is_device_scalar(setup):
    _, _, resident, _ = setup
    queries = [["w3"], ["w0", "w1"], ["w2"]]
    tvs, tis, checksum, q = resident.stream_score_topk_device(
        queries, 5, batch=2
    )
    assert q == 3 and tvs.shape == (2, 2, 5)
    assert int(checksum) == int(np.asarray(tis).sum())


def test_query_terms_overflow_raises(setup):
    _, _, resident, _ = setup
    with pytest.raises(ValueError):
        resident.query_terms([f"w{i}" for i in range(40)])


def test_query_terms_batch_matches_scalar(setup):
    """Vectorized prep == per-query prep as (term -> count) maps, across
    duplicates, unknown tokens, and empty queries; overflow still raises."""
    corpus, _, resident, _ = setup
    rng = np.random.default_rng(3)
    queries = []
    for i in range(37):
        doc = corpus[rng.integers(0, len(corpus))]
        take = rng.choice(len(doc), size=min(10, len(doc)), replace=True)
        q = [doc[j] for j in take] + ["UNKNOWN_TOKEN"] * (i % 3)
        queries.append(q)
    queries.append([])  # empty query row
    bids, bcnts = resident.query_terms_batch(queries)
    assert bids.shape == (len(queries), resident.max_query_terms)
    for i, q in enumerate(queries):
        sid, scnt = resident.query_terms(q)
        want = {
            int(t): float(c)
            for t, c in zip(sid, scnt)
            if t != resident.V
        }
        got = {
            int(t): float(c)
            for t, c in zip(bids[i], bcnts[i])
            if t != resident.V
        }
        assert got == want
    with pytest.raises(ValueError, match="distinct terms"):
        resident.query_terms_batch([["w0"], [f"w{i}" for i in range(40)]])


def test_empty_query_stream(setup):
    """A zero-length query stream returns empty results instead of crashing
    in the pad helper (reshape(0, batch, -1) is rejected by numpy)."""
    _, _, resident, _ = setup
    tv, ti = resident.stream_score_topk([], k=5, batch=4)
    assert tv.shape == (0, 5) and ti.shape == (0, 5)


def test_light_rows_layout_matches_csr(setup):
    """The padded term-major light layout ("rows") scores identically to
    the CSR-window layout across dir filters and the stream form."""
    _, index, _, _ = setup
    rows = ResidentSparseIndex(
        index, light_cap=32, max_query_terms=16, light_rows=True
    )
    csr = ResidentSparseIndex(
        index, light_cap=32, max_query_terms=16, light_rows=False
    )
    assert rows.light_layout == "rows" and csr.light_layout == "csr"
    assert rows.post_docs.ndim == 2 and csr.post_docs.ndim == 1
    queries = [["w3", "w14"], ["w1", "w2", "w2"], ["w0"]]
    dvals = ["d1", None, "zzz"]
    rv, ri = rows.score_topk(queries, 7, dir_values=dvals)
    cv, ci = csr.score_topk(queries, 7, dir_values=dvals)
    np.testing.assert_array_equal(rv, cv)
    np.testing.assert_array_equal(ri, ci)
    rv2, ri2 = rows.stream_score_topk(queries, 7, batch=2, dir_values=dvals)
    cv2, ci2 = csr.stream_score_topk(queries, 7, batch=2, dir_values=dvals)
    np.testing.assert_array_equal(rv2, cv2)
    np.testing.assert_array_equal(ri2, ci2)


def test_light_rows_budget_gate():
    """A tiny rows budget falls back to the CSR layout automatically."""
    corpus = synthetic_corpus(num_docs=80, vocab=50, seed=2)
    index = build_sparse_index(corpus, bm25_type=0)
    small = ResidentSparseIndex(
        index, light_cap=32, max_query_terms=8, light_rows_hbm_budget=64
    )
    assert small.light_layout == "csr"
    auto = ResidentSparseIndex(index, light_cap=32, max_query_terms=8)
    assert auto.light_layout == "rows"  # 51*32*8 bytes well under default


def test_light_prefix_slicing(setup):
    """Light-first prep + the bucketed light_t prefix: results identical to
    the full-width light gather, including for callers that pass UNSORTED
    term arrays (light_t_bound then just grows) and for pure-heavy streams
    (light_t == 0 skips the light gather entirely)."""
    corpus, index, _, _ = setup
    res = ResidentSparseIndex(index, light_cap=32, max_query_terms=16)
    queries = [["w3", "w14", "w1"], ["w2", "w0", "w5", "w9"]]
    ids, cnt = res.query_terms_batch(queries)
    # prep orders light terms into the prefix
    is_light = res._host_light_lens[ids] > 0
    for row in is_light:
        nz = np.nonzero(row)[0]
        assert len(nz) == 0 or nz.max() == len(nz) - 1
    bound = res.light_t_bound(ids)
    full_v, full_i = res._score_topk(ids, cnt, 9, None, light_t=None)
    cut_v, cut_i = res._score_topk(ids, cnt, 9, None, light_t=bound)
    np.testing.assert_array_equal(np.asarray(full_v), np.asarray(cut_v))
    np.testing.assert_array_equal(np.asarray(full_i), np.asarray(cut_i))
    # scrambled order: bound covers the furthest light column
    perm = np.arange(ids.shape[1])[::-1].copy()
    sids, scnt = ids[:, perm], cnt[:, perm]
    b2 = res.light_t_bound(sids)
    v2, i2 = res._score_topk(sids, scnt, 9, None, light_t=b2)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(full_v))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(full_i))
    # pure-heavy stream: every corpus term df > 2 with cap 2 -> no light
    heavy_only = ResidentSparseIndex(index, light_cap=1, max_query_terms=16)
    hids, hcnt = heavy_only.query_terms_batch(queries)
    if (heavy_only._host_light_lens[hids] > 0).any():
        return  # fixture has df-1 terms; prefix path already covered above
    assert heavy_only.light_t_bound(hids) == 0
    hv, hi = heavy_only._score_topk(hids, hcnt, 9, None, light_t=0)
    rv, ri = heavy_only._score_topk(hids, hcnt, 9, None, light_t=None)
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(rv))
