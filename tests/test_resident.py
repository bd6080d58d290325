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


@pytest.fixture(scope="module")
def mixed():
    """A corpus whose df spread straddles the cap: BOTH the heavy matmul
    and the light gather carry real mass (the module `setup` fixture's df
    min is above any small cap, so its light path is vacuous)."""
    corpus = synthetic_corpus(num_docs=150, vocab=300, seed=9)
    dirs = [f"d{i % 3}" for i in range(len(corpus))]
    index = build_sparse_index(corpus, bm25_type=0, dirs=dirs)
    lens = np.diff(index.stats.term_offsets)
    assert ((lens > 0) & (lens <= 16)).sum() > 50  # real light terms
    assert (lens > 16).sum() > 20  # real heavy terms
    return corpus, index


def _mixed_queries(corpus, n=12, seed=4):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        doc = corpus[rng.integers(0, len(corpus))]
        take = rng.choice(len(doc), size=min(8, len(doc)), replace=False)
        out.append([doc[i] for i in take])
    return out


def test_mixed_heavy_light_matches_host_oracle(mixed):
    """Resident scoring == host oracle on a corpus where heavy AND light
    contributions are both nonzero, in both light layouts."""
    corpus, index = mixed
    queries = _mixed_queries(corpus)
    for light_rows in (True, False):
        res = ResidentSparseIndex(
            index, light_cap=16, max_query_terms=16, light_rows=light_rows
        )
        ids, cnt = res.query_terms_batch(queries)
        # non-vacuity: queries hit light terms
        assert (res._host_light_lens[ids] > 0).any()
        tv, ti = res.stream_score_topk(queries, 10, batch=4)
        for i, q in enumerate(queries):
            host = index.get_scores_host(q)
            order = np.argsort(host, kind="stable")[::-1]
            order = order[host[order] > 0][:10]
            n_fin = int(np.isfinite(tv[i]).sum())
            assert n_fin == len(order)
            np.testing.assert_array_equal(ti[i][:n_fin], order)
            np.testing.assert_allclose(
                tv[i][:n_fin], host[order], rtol=1e-5, atol=1e-6
            )


def test_light_rows_layout_matches_csr(mixed):
    """The padded term-major light layout scores identically to the CSR
    layout on real light mass, across dir filters and the stream form."""
    _, index = mixed
    rows = ResidentSparseIndex(
        index, light_cap=16, max_query_terms=16, light_rows=True
    )
    csr = ResidentSparseIndex(
        index, light_cap=16, max_query_terms=16, light_rows=False
    )
    assert rows.light_layout == "rows" and csr.light_layout == "csr"
    assert rows.post_docs.ndim == 2 and csr.post_docs.ndim == 1
    queries = _mixed_queries(index and mixed[0] or None, n=6, seed=5)
    ids, _ = rows.query_terms_batch(queries)
    assert (rows._host_light_lens[ids] > 0).any()  # non-vacuous
    dvals = ["d1", None, "zzz", None, "d0", None]
    rv, ri = rows.score_topk(queries, 7, dir_values=dvals)
    cv, ci = csr.score_topk(queries, 7, dir_values=dvals)
    np.testing.assert_array_equal(rv, cv)
    np.testing.assert_array_equal(ri, ci)
    rv2, ri2 = rows.stream_score_topk(queries, 7, batch=2, dir_values=dvals)
    cv2, ci2 = csr.stream_score_topk(queries, 7, batch=2, dir_values=dvals)
    np.testing.assert_array_equal(rv2, cv2)
    np.testing.assert_array_equal(ri2, ci2)


def test_light_prefix_slicing(mixed):
    """Light-first prep + the bucketed light_t prefix: identical results,
    including unsorted caller arrays and the pure-heavy light_t=0 path."""
    corpus, index = mixed
    res = ResidentSparseIndex(index, light_cap=16, max_query_terms=16)
    queries = _mixed_queries(corpus, n=5, seed=6)
    ids, cnt = res.query_terms_batch(queries)
    is_light = res._host_light_lens[ids] > 0
    assert is_light.any()  # non-vacuous
    for row in is_light:  # prep packs light terms into the prefix
        nz = np.nonzero(row)[0]
        assert len(nz) == 0 or nz.max() == len(nz) - 1
    bound = res.light_t_bound(ids)
    assert 0 < bound < ids.shape[1]  # the slice actually cuts work
    full_v, full_i = res._score_topk(ids, cnt, 9, None, light_t=None)
    cut_v, cut_i = res._score_topk(ids, cnt, 9, None, light_t=bound)
    np.testing.assert_array_equal(np.asarray(full_v), np.asarray(cut_v))
    np.testing.assert_array_equal(np.asarray(full_i), np.asarray(cut_i))
    # scrambled caller arrays: the bound grows to cover the furthest light
    # column, results unchanged
    perm = np.arange(ids.shape[1])[::-1].copy()
    sids, scnt = ids[:, perm].copy(), cnt[:, perm].copy()
    b2 = res.light_t_bound(sids)
    assert b2 >= ids.shape[1] - bound  # reversed -> light terms at the end
    v2, i2 = res._score_topk(sids, scnt, 9, None, light_t=b2)
    # scatter order differs for permuted slots -> f32 sums differ at ~1e-7
    np.testing.assert_allclose(
        np.asarray(v2), np.asarray(full_v), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(full_i))
    # pure-heavy queries: light_t == 0 skips the gather, scores unchanged
    lens = np.diff(index.stats.term_offsets)
    id2tok = {tid: tok for tok, tid in index.stats.vocab.items()}
    heavy_vocab = [id2tok[t] for t in np.where(lens > 16)[0][:6]]
    hq = [heavy_vocab[:4], heavy_vocab[2:6]]
    hids, hcnt = res.query_terms_batch(hq)
    assert res.light_t_bound(hids) == 0
    hv, hi = res._score_topk(hids, hcnt, 9, None, light_t=0)
    rv, ri = res._score_topk(hids, hcnt, 9, None, light_t=None)
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(ri))


def test_heavy_gather_matmul_forms_agree(setup):
    """The two statically-chosen heavy forms (row gather+einsum vs one-hot
    MXU matmul — ops/bm25_resident.py, r3) must agree to f32 rounding on
    scores and exactly on membership/ordering for non-tied scores."""
    import jax.numpy as jnp

    from easyrag_tpu.ops.bm25_resident import _resident_score_topk

    _, index, resident, _ = setup
    queries = [["w0", "w1", "w2", "w3"], ["w5", "w5", "w9"], ["w2"]]
    ids, cnts = resident.query_terms_batch(queries)
    out = {}
    for form in ("gather", "matmul"):
        tv, ti = _resident_score_topk(
            resident.heavy, resident.t_heavy_row, resident.t_starts,
            resident.t_light_lens, resident.post_docs, resident.post_vals,
            None, jnp.asarray(ids), jnp.asarray(cnts), None,
            resident.heavy_scales,
            k=12, num_docs=resident.num_docs, light_cap=resident.light_cap,
            P=resident.P, tail=resident.tail, light=resident.light_layout,
            heavy_form=form,
        )
        out[form] = (np.asarray(tv), np.asarray(ti))
    gv, gi = out["gather"]
    mv, mi = out["matmul"]
    np.testing.assert_allclose(gv, mv, rtol=1e-6, atol=1e-6)
    # identical ordering wherever scores are not near-ties
    gaps = np.abs(np.diff(mv, axis=1))
    stable = np.ones_like(mi, bool)
    stable[:, :-1] &= gaps > 1e-5
    stable[:, 1:] &= gaps > 1e-5
    np.testing.assert_array_equal(gi[stable], mi[stable])
