"""Fully device-resident BM25 index: HBM postings, KB-sized queries.

The gather-on-host path (``ops/bm25.py``) ships megabytes of postings per
query batch — fine on a local chip, but a remote-attached TPU is transfer
bound. Here the index lives in HBM once and a query transfers only its term
ids and counts (a few KB), the design BASELINE.json prescribes ("CSR
postings + term-at-a-time scoring over HBM").

Zipf-aware split:

* **heavy terms** (postings > ``light_cap``, the Zipf head — a few hundred
  terms): their full per-doc contribution rows are packed into a dense
  ``[H, N]`` f32 matrix. A query's heavy part is one MXU matmul:
  ``counts_onehot [B, H] @ heavy [H, N]``.
* **light terms** (the tail): CSR postings stay packed in HBM; the device
  gathers each query term's ≤``light_cap`` postings with a bounded window
  and scatter-adds them.

Both parts accumulate in f32; results match the host float64 oracle to f32
rounding, and ordering/tie policy matches ``ops/topk.py``.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.sparse import SparseIndex
from .topk import topk_desc_reference_order

NEG_INF = float("-inf")  # host constant: a jnp scalar here would initialize
# the XLA backend at import time, breaking jax.distributed.initialize ordering


def _resident_score_topk_impl(
    heavy, t_heavy_row, t_starts, t_light_lens, post_docs, post_vals, dir_col,
    term_ids, counts, dir_filter, heavy_scales=None,
    *, k: int, num_docs: int, light_cap: int, P: int, tail: str = "xla",
    light: str = "csr", light_t: Optional[int] = None,
    heavy_form: str = "auto",
):
    B, T = term_ids.shape
    N, C = num_docs, light_cap
    H = heavy.shape[0]

    # heavy part. Two equivalent forms, chosen statically by bytes read:
    # the one-hot matmul re-streams the whole [H, N] matrix every batch,
    # while a row gather reads only the B*T rows the batch references —
    # measured 1.7x at H=3072 and H-independent (r3, tools/
    # exp_sparse_heavy.py), so it wins whenever B*T < H (the production
    # operating point: B=64, T<=16, H in the thousands).
    hrow = t_heavy_row[term_ids]  # [B, T], -1 for light/pad
    use_gather = B * T < H if heavy_form == "auto" else heavy_form == "gather"
    if use_gather:
        rr = jnp.where(hrow >= 0, hrow, 0)
        w = jnp.where(hrow >= 0, counts, 0.0)  # [B, T] f32
        g = heavy[rr]  # [B, T, N]
        if heavy.dtype == jnp.int8:
            # per-DOC-COLUMN scale factors out of the term sum
            scores = jnp.einsum(
                "bt,btn->bn", w, g.astype(jnp.float32)
            ) * heavy_scales[None, :]
        else:
            # bf16 rows widen to f32 before the (<=T-term) accumulation —
            # same f32 rounding class as the matmul contraction
            scores = jnp.einsum(
                "bt,btn->bn", w, g.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
    else:
        hrow_or_drop = jnp.where(hrow >= 0, hrow, H)
        A = jnp.zeros((B, H), jnp.float32)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        A = A.at[b_idx, hrow_or_drop].add(
            jnp.where(hrow >= 0, counts, 0.0), mode="drop"
        )
        dims = (((1,), (0,)), ((), ()))
        if heavy.dtype == jnp.int8:
            # s8 x s8 -> s32 natively on the MXU. Query-term counts are small
            # integers, exact in s8 (clipped defensively); the per-DOC-COLUMN
            # scale factors out of the contraction over terms and is applied
            # once to the s32 result.
            scores = jax.lax.dot_general(
                jnp.clip(A, 0, 127).astype(jnp.int8),
                heavy,
                dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * heavy_scales[None, :]
        elif heavy.dtype == jnp.bfloat16:
            # counts <= 127 are exact in bf16; only the stored postings round
            scores = jax.lax.dot_general(
                A.astype(jnp.bfloat16),
                heavy,
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
        else:
            scores = jax.lax.dot_general(
                A,
                heavy,
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # keep f32 exact on the MXU
            )  # [B, N]

    # light part: bounded gather of each term's postings + scatter-add.
    # ``light_t`` bounds how many LEADING term slots can hold light terms
    # (host prep orders light terms first and buckets the per-stream max):
    # queries average ~3 light terms of T=16 slots, so slicing the gather
    # to the light prefix drops most of the tail's sentinel work.
    TL = light_t if light_t is not None else T
    lt_ids = term_ids[:, :TL]
    lt_counts = counts[:, :TL]
    if light == "rows":
        # padded term-major layout: post_docs/post_vals are [V+1, C] rows
        # (window pre-gathered at build, sentinel-padded) — one contiguous
        # row gather per (query, term) instead of B*T*C independent
        # element gathers through the CSR indirection; measured 2x faster
        # at the bench operating point (123 -> 61 ms per 4096-query
        # stream) for (V+1)*C*8 bytes of HBM
        docs = post_docs[lt_ids]  # [B, TL, C]; pad slots -> N
        vals = post_vals[lt_ids] * lt_counts[:, :, None]
    else:
        starts = t_starts[lt_ids]  # [B, TL]
        lens = t_light_lens[lt_ids]
        win = jnp.arange(C, dtype=jnp.int32)[None, None, :]
        valid = win < lens[:, :, None]
        pos = jnp.where(valid, starts[:, :, None] + win, P)  # sentinel slot
        docs = post_docs[pos]  # [B, TL, C]; sentinel -> N
        vals = post_vals[pos] * lt_counts[:, :, None]
    if tail in ("pallas", "pallas_interpret"):
        # one-hot-matmul accumulation (MXU) instead of XLA scatter-add —
        # measured 2.3x faster at [64, 2048] -> [64, 20000]; sentinel slots
        # carry val 0 so they add nothing (``ops/bm25_pallas.py`` contract)
        from .bm25_pallas import bm25_scores_pallas

        scores = scores + bm25_scores_pallas(
            docs.reshape(B, -1),
            vals.reshape(B, -1),
            num_docs=N,
            interpret=tail == "pallas_interpret",
        )
    else:
        # flat-index scatter into the raveled scores alias: folding the
        # batch dim into the index runs at 6.8 ns/slot vs 10.2 for the
        # batched 2-D scatter (measured r3, tools/exp_scatter.py at the
        # operating shape); sentinel slots (doc == N) route to the OOB
        # index B*N and drop
        b_off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        flat_idx = jnp.where(docs < N, b_off + docs, B * N)
        scores = (
            scores.reshape(B * N)
            .at[flat_idx.reshape(-1)]
            .add(vals.reshape(-1), mode="drop")
            .reshape(B, N)
        )

    if dir_col is not None and dir_filter is not None:
        # -1 disables filtering; -2 (unknown dir) matches nothing
        keep = jnp.logical_or(
            dir_filter[:, None] == -1,
            dir_col[None, :] == dir_filter[:, None],
        )
        scores = jnp.where(keep, scores, NEG_INF)
    scores = jnp.where(scores > 0, scores, NEG_INF)
    top_vals, top_idx = topk_desc_reference_order(scores, k)
    top_idx = jnp.where(jnp.isfinite(top_vals), top_idx, N)
    return top_vals, top_idx


_resident_score_topk = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "num_docs", "light_cap", "P", "tail", "light", "light_t",
        "heavy_form",
    ),
)(_resident_score_topk_impl)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "num_docs", "light_cap", "P", "tail", "light", "light_t",
        "heavy_form",
    ),
)
def _resident_score_topk_stream(
    heavy, t_heavy_row, t_starts, t_light_lens, post_docs, post_vals, dir_col,
    term_ids, counts, dir_filter, heavy_scales=None,
    *, k: int, num_docs: int, light_cap: int, P: int, tail: str = "xla",
    light: str = "csr", light_t: Optional[int] = None,
    heavy_form: str = "auto",
):
    """Score a whole query STREAM in one compiled dispatch.

    ``term_ids``/``counts`` are ``[NB, B, T]`` (a stack of query batches),
    ``dir_filter`` is ``[NB, B]`` or None. Batches run sequentially on
    device via ``lax.scan`` — the work is inherently sequential anyway, and
    folding it into ONE dispatch removes the per-batch host round trip that
    dominates on a remote-attached chip (measured: per-batch dispatch costs
    ~15 ms/batch end-to-end vs 3.7 ms of device work). Returns stacked
    ``(top_vals [NB,B,k], top_idx [NB,B,k], checksum scalar)``; the checksum
    is a 4-byte completion barrier so callers timing the stream never pay a
    bulk result download (``block_until_ready`` does not sync on this
    attachment — see BASELINE.md measurement notes).
    """

    def step(_, inp):
        ids, cnts, dirf = inp if dir_filter is not None else (*inp, None)
        tv, ti = _resident_score_topk_impl(
            heavy, t_heavy_row, t_starts, t_light_lens, post_docs, post_vals,
            dir_col, ids, cnts, dirf, heavy_scales,
            k=k, num_docs=num_docs, light_cap=light_cap, P=P, tail=tail,
            light=light, light_t=light_t, heavy_form=heavy_form,
        )
        return 0, (tv, ti)

    xs = (term_ids, counts)
    if dir_filter is not None:
        xs = xs + (dir_filter,)
    _, (tvs, tis) = jax.lax.scan(step, 0, xs)
    return tvs, tis, tis.sum()


def pad_query_stream(
    ids: np.ndarray,
    cnts: np.ndarray,
    dir_f: Optional[np.ndarray],
    batch: int,
    sentinel_term: int,
):
    """Pad the query axis to a multiple of ``batch`` with sentinel rows
    (term = sentinel, count 0 -> every score 0 -> dropped; dir -1 = no
    filter) and reshape to scan form ``[NB, B, *]``. One definition of the
    stream padding contract, shared by the single-chip and sharded sparse
    streams. Returns ``(ids, cnts, dir_f, n_batches, Q)``."""
    Q = ids.shape[0]
    n_batches = (Q + batch - 1) // batch
    pad = n_batches * batch - Q
    if pad:
        ids = np.concatenate(
            [ids, np.full((pad, ids.shape[1]), sentinel_term, np.int32)]
        )
        cnts = np.concatenate(
            [cnts, np.zeros((pad, cnts.shape[1]), np.float32)]
        )
        if dir_f is not None:
            dir_f = np.concatenate([dir_f, np.full(pad, -1, np.int32)])
    # explicit last dims: reshape(0, batch, -1) is rejected for empty streams
    ids = ids.reshape(n_batches, batch, ids.shape[1])
    cnts = cnts.reshape(n_batches, batch, cnts.shape[1])
    if dir_f is not None:
        dir_f = dir_f.reshape(n_batches, batch)
    return ids, cnts, dir_f, n_batches, Q


def auto_light_cap(
    lens: np.ndarray,
    num_docs: int,
    itemsize: int,
    heavy_hbm_budget: int,
    max_query_terms: int,
    kappa_scale: float = 1.0,
) -> int:
    """Pick the light/heavy split cap by cost model rather than taking the
    smallest cap that fits the budget. Per scan step,

      heavy ~ H(cap) * num_docs * itemsize / BW   (the matmul streams the
        heavy matrix at the HBM roofline — measured 899 GB/s on v5e once
        host prep is excluded)
      light ~ KAPPA * B * T * cap^2               (gather+scatter tail;
        empirically quadratic in cap — scatter conflicts grow with the
        postings-window length)

    Constants fit the measured v5e curve at 20k docs / B=64 / T=16 (qps:
    cap 16 -> 8.3k, 32 -> 9.4k, 64 -> 10.3k, 128 -> 8.0k, 256 -> 4.3k; the
    model reproduces the ordering and the knee). The budget stays a hard
    constraint; itemsize scales the heavy term, so compressed heavy dtypes
    shift the optimum lower. Sharded indexes pass their per-shard doc count
    as ``num_docs`` (the budget is per shard)."""
    BW_BYTES_PER_MS = 899e6
    KAPPA_MS = 1.48e-7 * kappa_scale
    stream_b = 64  # default stream batch (stream_score_topk)
    best_cost, cap = None, None
    c = 8
    while c < max(num_docs, 16):
        n_heavy = int((lens > c).sum())
        if n_heavy * num_docs * itemsize <= heavy_hbm_budget:
            cost = (
                n_heavy * num_docs * itemsize / BW_BYTES_PER_MS
                + KAPPA_MS * stream_b * max_query_terms * c * c
            )
            if best_cost is None or cost < best_cost:
                best_cost, cap = cost, c
            elif cost > 2 * best_cost:
                break  # quadratic tail only grows from here
        c *= 2
    return cap if cap is not None else num_docs


class ResidentSparseIndex:
    def __init__(
        self,
        index: SparseIndex,
        light_cap: Optional[int] = None,
        max_query_terms: int = 64,
        heavy_hbm_budget: int = 512 * 1024 * 1024,
        heavy_dtype: str = "float32",
        tail: Optional[str] = None,
        light_rows: Optional[bool] = None,
        light_rows_hbm_budget: int = 256 * 1024 * 1024,
    ) -> None:
        """``tail`` selects the light-postings accumulator: ``"xla"``
        (scatter-add, default), ``"pallas"`` (one-hot-matmul MXU kernel,
        measured 2.3x faster — TPU only), or ``"pallas_interpret"`` (the
        same kernel in interpreter mode, for CPU tests).

        ``heavy_dtype`` trades exactness for HBM headroom on large
        corpora: ``float32`` (default) is exact vs the host oracle;
        ``bfloat16`` halves the heavy matrix (stored postings round to 8
        mantissa bits, ~0.4% score error); ``int8`` quarters it (per-doc-
        column symmetric quantization, s8 MXU accumulation in s32). Smaller
        dtypes let the auto ``light_cap`` fall further, shifting work from
        the slow gather tail to the fast dense matmul."""
        if heavy_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unsupported heavy_dtype {heavy_dtype!r}")
        if tail not in (None, "xla", "pallas", "pallas_interpret"):
            raise ValueError(f"unsupported tail {tail!r}")
        self.tail = tail or "xla"
        self.host_index = index
        self.num_docs = index.num_docs
        self.max_query_terms = max_query_terms
        self.heavy_dtype = heavy_dtype
        itemsize = {"float32": 4, "bfloat16": 2, "int8": 1}[heavy_dtype]

        offs = index.stats.term_offsets
        lens = np.diff(offs).astype(np.int32)
        V = len(lens)
        if light_cap is None:
            # KAPPA was fitted on the CSR gather; the rows layout halves
            # the tail, so pick the cap under the layout that will be
            # active (rows first, CSR re-pick if its table won't fit)
            cap = auto_light_cap(
                lens, index.num_docs, itemsize, heavy_hbm_budget,
                max_query_terms, kappa_scale=0.5,
            )
            rows_ok = light_rows is not False and (
                (V + 1) * cap * 8 <= light_rows_hbm_budget
            )
            if not rows_ok:
                cap = auto_light_cap(
                    lens, index.num_docs, itemsize, heavy_hbm_budget,
                    max_query_terms,
                )
            light_cap = cap
        self.light_cap = light_cap
        heavy_terms = np.where(lens > light_cap)[0]
        H = max(int(len(heavy_terms)), 1)
        H = ((H + 7) // 8) * 8  # pad for clean tiling

        heavy_matrix = np.zeros((H, index.num_docs), dtype=np.float32)
        heavy_row = np.full(V + 1, -1, dtype=np.int32)  # +1: pad-term slot
        for row, t in enumerate(heavy_terms):
            lo, hi = offs[t], offs[t + 1]
            heavy_matrix[row, index.stats.post_docs[lo:hi]] = index.post_vals[
                lo:hi
            ].astype(np.float32)
            heavy_row[t] = row

        starts = np.zeros(V + 1, dtype=np.int32)
        starts[:V] = offs[:-1]
        light_lens = np.zeros(V + 1, dtype=np.int32)
        light_lens[:V] = lens
        light_lens[:V][heavy_terms] = 0  # heavy terms excluded from gather

        P = len(index.stats.post_docs)
        # pad the postings arrays with one sentinel slot (doc id = N, val 0)
        post_docs = np.concatenate(
            [index.stats.post_docs.astype(np.int32), [index.num_docs]]
        )
        post_vals = np.concatenate(
            [index.post_vals.astype(np.float32), [0.0]]
        ).astype(np.float32)

        self.V = V
        self.P = P
        self.heavy_scales = None
        if heavy_dtype == "int8":
            # per-doc-column symmetric scale: factors out of the term
            # contraction (scores[b,d] = s[d] * sum_h counts[b,h]*q[h,d])
            col_max = np.abs(heavy_matrix).max(axis=0)
            scales = np.where(col_max > 0, col_max / 127.0, 1.0).astype(
                np.float32
            )
            q = np.rint(heavy_matrix / scales[None, :]).astype(np.int8)
            self.heavy = jnp.asarray(q)
            self.heavy_scales = jnp.asarray(scales)
        elif heavy_dtype == "bfloat16":
            self.heavy = jnp.asarray(heavy_matrix, dtype=jnp.bfloat16)
        else:
            self.heavy = jnp.asarray(heavy_matrix)
        self.t_heavy_row = jnp.asarray(heavy_row)
        self.t_starts = jnp.asarray(starts)
        self.t_light_lens = jnp.asarray(light_lens)
        self._host_light_lens = light_lens  # host copy for query prep
        # light-postings layout: "rows" pre-gathers each term's window into
        # a padded [V+1, C] table — one contiguous row gather per (query,
        # term) at score time instead of B*T*C element gathers through the
        # CSR indirection (measured 2x tail speedup); costs (V+1)*C*8 bytes
        # of HBM, so huge vocabularies fall back to the CSR layout.
        table_bytes = (V + 1) * self.light_cap * 8
        if light_rows is None:
            light_rows = table_bytes <= light_rows_hbm_budget
        self.light_layout = "rows" if light_rows else "csr"
        if light_rows:
            win = np.arange(self.light_cap, dtype=np.int64)[None, :]
            valid = win < light_lens[:, None]  # [V+1, C]
            pos = np.where(valid, starts[:, None].astype(np.int64) + win, P)
            self.post_docs = jnp.asarray(post_docs[pos])
            self.post_vals = jnp.asarray(post_vals[pos])
        else:
            self.post_docs = jnp.asarray(post_docs)
            self.post_vals = jnp.asarray(post_vals)
        self.dir_col = (
            jnp.asarray(index.dir_ids) if index.dir_ids is not None else None
        )
        self.dir_vocab = index.dir_vocab

    # -- host-side query prep -------------------------------------------------

    def query_terms(self, query_tokens: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Tokens -> (term_ids[T], counts[T]) padded with the sentinel term.

        Duplicate query tokens become counts (rank_bm25 sums per occurrence).
        """
        vocab = self.host_index.stats.vocab
        counts: dict = {}
        for tok in query_tokens:
            tid = vocab.get(tok)
            if tid is not None:
                counts[tid] = counts.get(tid, 0) + 1
        T = self.max_query_terms
        ids = np.full(T, self.V, dtype=np.int32)
        cnt = np.zeros(T, dtype=np.float32)
        # light terms first: lets the scorer slice the light gather to a
        # short prefix (light_t) — scoring is order-invariant within a row
        items = sorted(
            counts.items(),
            key=lambda tc: self._host_light_lens[tc[0]] == 0,
        )
        for i, (tid, c) in enumerate(items[:T]):
            ids[i] = tid
            cnt[i] = c
        if len(counts) > T:
            raise ValueError(
                f"query has {len(counts)} distinct terms > max_query_terms={T}"
            )
        return ids, cnt

    def query_terms_batch(
        self, queries_tokens: Sequence[Sequence[str]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized :meth:`query_terms` over a whole query stream:
        ``(ids[Q, T], counts[Q, T])``. One ``np.unique`` over combined
        (query, term) keys replaces per-query dicts + array builds (~5x
        less host time ahead of the one-dispatch stream scorer; the term
        order within a row differs from the scalar path but scoring sums
        over terms, so results are identical)."""
        vocab = self.host_index.stats.vocab
        Q, T, V = len(queries_tokens), self.max_query_terms, self.V
        qidx: List[int] = []
        tids: List[int] = []
        for i, toks in enumerate(queries_tokens):
            for tok in toks:
                tid = vocab.get(tok)
                if tid is not None:
                    qidx.append(i)
                    tids.append(tid)
        ids = np.full((Q, T), V, dtype=np.int32)
        cnt = np.zeros((Q, T), dtype=np.float32)
        if qidx:
            key = np.asarray(qidx, np.int64) * (V + 1) + np.asarray(
                tids, np.int64
            )
            uniq, counts = np.unique(key, return_counts=True)
            rows = (uniq // (V + 1)).astype(np.int64)
            terms = (uniq % (V + 1)).astype(np.int32)
            # rows is sorted: position-within-row = rank - first-rank-of-row
            starts = np.searchsorted(rows, np.arange(Q))
            pos = np.arange(len(rows)) - starts[rows]
            if len(pos) and int(pos.max()) >= T:
                bad = int(rows[int(pos.argmax())])
                n = int((rows == bad).sum())
                raise ValueError(
                    f"query has {n} distinct terms > max_query_terms={T}"
                )
            ids[rows, pos] = terms
            cnt[rows, pos] = counts.astype(np.float32)
            # light terms first within each row (see query_terms)
            order = np.argsort(
                self._host_light_lens[ids] == 0, axis=1, kind="stable"
            )
            ids = np.take_along_axis(ids, order, axis=1)
            cnt = np.take_along_axis(cnt, order, axis=1)
        return ids, cnt

    def light_t_bound(self, ids: np.ndarray) -> int:
        """Bucketed bound on how many LEADING term slots hold light terms
        (the static slice length for the scorer's light gather). 0 when the
        stream has no light terms at all."""
        mask = self._host_light_lens[np.asarray(ids).reshape(-1, ids.shape[-1])] > 0
        cols = mask.any(axis=0)
        if not cols.any():
            return 0
        need = int(np.max(np.nonzero(cols)[0])) + 1
        b = 4
        while b < need:
            b *= 2
        # clamp to the ARRAY width (callers may pass wider arrays than
        # max_query_terms) — clamping narrower would silently drop light
        # contributions
        return min(b, ids.shape[-1])

    # -- device scoring ---------------------------------------------------------

    def _score_topk(
        self,
        term_ids: jnp.ndarray,  # [B, T]
        counts: jnp.ndarray,  # [B, T] f32
        k: int,
        dir_filter: Optional[jnp.ndarray] = None,  # [B] int32 or None
        light_t: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Jitted scoring. The index arrays are jit *arguments* (NOT
        closure constants via a static self — that bakes hundreds of MB of
        literals into the compile payload; measured as HTTP 413 on the
        remote compiler and multi-minute compiles)."""
        return _resident_score_topk(
            self.heavy, self.t_heavy_row, self.t_starts, self.t_light_lens,
            self.post_docs, self.post_vals, self.dir_col,
            term_ids, counts, dir_filter, self.heavy_scales,
            k=k, num_docs=self.num_docs, light_cap=self.light_cap, P=self.P,
            tail=self.tail, light=self.light_layout, light_t=light_t,
        )

    def score_topk(
        self,
        queries_tokens: Sequence[Sequence[str]],
        k: int,
        dir_values: Optional[Sequence[Optional[str]]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched query -> (scores[B,k], doc indices[B,k]); dropped entries
        are (-inf, num_docs)."""
        ids, cnts = self.query_terms_batch(queries_tokens)
        dir_f = None
        if dir_values is not None and self.dir_col is not None:
            dir_f = jnp.asarray(
                np.array(
                    [
                        self.dir_vocab.get(d, -2) if d else -1
                        for d in dir_values
                    ],
                    dtype=np.int32,
                )
            )
        # light_t stays None here: this is the interactive path (latency is
        # round-trip bound; a per-call bucket would recompile mid-serving).
        # The stream entries compute the bound — that is where it pays.
        tv, ti = self._score_topk(jnp.asarray(ids), jnp.asarray(cnts), k, dir_f)
        return np.asarray(tv), np.asarray(ti)

    def stream_score_topk_device(
        self,
        queries_tokens: Sequence[Sequence[str]],
        k: int,
        batch: int = 64,
        dir_values: Optional[Sequence[Optional[str]]] = None,
    ):
        """Score MANY queries in one compiled dispatch (batches scanned on
        device). Returns ``(top_vals [NB,B,k], top_idx [NB,B,k], checksum)``
        still on device plus the real query count; the tail batch is padded
        by repetition. Use this for batch eval / benchmarking: one upload,
        one dispatch, and the 4-byte checksum is the completion barrier —
        fetch the bulk results only if you need them."""
        ids, cnts = self.query_terms_batch(queries_tokens)
        dir_f = None
        if dir_values is not None and self.dir_col is not None:
            dir_f = np.array(
                [self.dir_vocab.get(d, -2) if d else -1 for d in dir_values],
                dtype=np.int32,
            )
        return self.stream_from_arrays(ids, cnts, dir_f, k, batch=batch)

    def stream_from_arrays(
        self,
        ids: np.ndarray,  # [Q, T] int32 term ids (sentinel-padded rows)
        cnts: np.ndarray,  # [Q, T] f32
        dir_f: Optional[np.ndarray],  # [Q] int32 or None
        k: int,
        batch: int = 64,
    ):
        """Lower-level stream entry for callers that already prepped term-id
        arrays (``retrievers.BM25Retriever.retrieve_batch``). Pads the query
        axis to a multiple of ``batch`` with sentinel rows (every score 0 ->
        dropped) so the compiled shape is fixed per scan length, then scores
        the whole stream in one dispatch."""
        ids, cnts, dir_f, _, Q = pad_query_stream(
            ids, cnts, dir_f, batch, self.V
        )
        tvs, tis, checksum = _resident_score_topk_stream(
            self.heavy, self.t_heavy_row, self.t_starts, self.t_light_lens,
            self.post_docs, self.post_vals, self.dir_col,
            jnp.asarray(ids), jnp.asarray(cnts),
            jnp.asarray(dir_f) if dir_f is not None else None,
            self.heavy_scales,
            k=k, num_docs=self.num_docs, light_cap=self.light_cap, P=self.P,
            tail=self.tail, light=self.light_layout,
            light_t=self.light_t_bound(ids),
        )
        return tvs, tis, checksum, Q

    def stream_score_topk(
        self,
        queries_tokens: Sequence[Sequence[str]],
        k: int,
        batch: int = 64,
        dir_values: Optional[Sequence[Optional[str]]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-array variant of :meth:`stream_score_topk_device`:
        ``(scores[Q,k], indices[Q,k])`` with the padding rows stripped, in
        one bulk fetch."""
        tvs, tis, _, Q = self.stream_score_topk_device(
            queries_tokens, k, batch=batch, dir_values=dir_values
        )
        tvs, tis = jax.device_get((tvs, tis))
        kk = tvs.shape[-1]
        return tvs.reshape(-1, kk)[:Q], tis.reshape(-1, kk)[:Q]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k1", "k2", "num_docs", "light_cap1", "light_cap2", "P1", "P2",
        "tail1", "tail2", "light1", "light2", "light_t1", "light_t2",
    ),
)
def _dual_resident_score_topk(
    args1, args2, term_ids1, counts1, term_ids2, counts2, dir_filter,
    *, k1: int, k2: int, num_docs: int,
    light_cap1: int, light_cap2: int, P1: int, P2: int,
    tail1: str = "xla", tail2: str = "xla",
    light1: str = "csr", light2: str = "csr",
    light_t1: Optional[int] = None, light_t2: Optional[int] = None,
):
    """Score one query batch against two resident indexes (the content and
    know-path routes of the dual-route retrieval) in one compiled step —
    one dispatch instead of two, which matters when each dispatch is a
    network round trip. The routes have separate vocabularies, so each
    takes its own term ids (same tokens, per-index lookup). Only the
    content route takes the dir filter, matching the reference
    (the path route is unfiltered, ``pipeline.py:357-365``)."""
    heavy1, hrow1, starts1, lens1, pdocs1, pvals1, dircol1, hs1 = args1
    heavy2, hrow2, starts2, lens2, pdocs2, pvals2, _, hs2 = args2
    tv1, ti1 = _resident_score_topk(
        heavy1, hrow1, starts1, lens1, pdocs1, pvals1, dircol1,
        term_ids1, counts1, dir_filter, hs1,
        k=k1, num_docs=num_docs, light_cap=light_cap1, P=P1, tail=tail1,
        light=light1, light_t=light_t1,
    )
    tv2, ti2 = _resident_score_topk(
        heavy2, hrow2, starts2, lens2, pdocs2, pvals2, None,
        term_ids2, counts2, None, hs2,
        k=k2, num_docs=num_docs, light_cap=light_cap2, P=P2, tail=tail2,
        light=light2, light_t=light_t2,
    )
    return tv1, ti1, tv2, ti2


class DualResidentScorer:
    """One-dispatch scorer over the content + path resident indexes."""

    def __init__(self, content: "ResidentSparseIndex", path: "ResidentSparseIndex"):
        if content.num_docs != path.num_docs:
            raise ValueError("dual routes must index the same node list")
        self.content = content
        self.path = path

    def _args(self, r: "ResidentSparseIndex"):
        return (
            r.heavy, r.t_heavy_row, r.t_starts, r.t_light_lens,
            r.post_docs, r.post_vals, r.dir_col, r.heavy_scales,
        )

    def score_topk(
        self, query_tokens_batch, k_content: int, k_path: int, dir_fs,
    ):
        """Tokenized queries -> ((tv1, ti1), (tv2, ti2)) host arrays.
        ``dir_fs``: per-row int filter values (-1 none, -2 never-match)."""
        ids1, cnt1 = self.content.query_terms_batch(query_tokens_batch)
        ids2, cnt2 = self.path.query_terms_batch(query_tokens_batch)
        tv1, ti1, tv2, ti2 = _dual_resident_score_topk(
            self._args(self.content), self._args(self.path),
            jnp.asarray(ids1), jnp.asarray(cnt1),
            jnp.asarray(ids2), jnp.asarray(cnt2),
            jnp.asarray(np.asarray(dir_fs, dtype=np.int32)),
            k1=k_content, k2=k_path, num_docs=self.content.num_docs,
            light_cap1=self.content.light_cap, light_cap2=self.path.light_cap,
            P1=self.content.P, P2=self.path.P,
            tail1=self.content.tail, tail2=self.path.tail,
            light1=self.content.light_layout, light2=self.path.light_layout,
        )
        # one bulk fetch: separate np.asarray calls each pay a host round
        # trip on remote-attached devices
        tv1, ti1, tv2, ti2 = jax.device_get((tv1, ti1, tv2, ti2))
        return (tv1, ti1), (tv2, ti2)

    def stream_score_topk(
        self,
        query_tokens_batch,
        k_content: int,
        k_path: int,
        dir_fs,
        batch: int = 64,
    ):
        """Both routes of the WHOLE query stream in ONE compiled dispatch
        (64-query batches scanned on device) plus one bulk fetch — the
        batch-eval shape of the reference's default dual-route operating
        point. Same results as :meth:`score_topk`, padding stripped."""
        ids1, cnt1 = self.content.query_terms_batch(query_tokens_batch)
        ids2, cnt2 = self.path.query_terms_batch(query_tokens_batch)
        return self.stream_from_arrays(
            ids1, cnt1, ids2, cnt2, dir_fs, k_content, k_path, batch=batch
        )

    def stream_from_arrays(
        self, ids1, cnt1, ids2, cnt2, dir_fs, k_content, k_path,
        batch: int = 64,
    ):
        """Arrays-level form of :meth:`stream_score_topk` for callers that
        already prepped term ids (``pipeline._dual_retrieve_stream`` keeps
        the arrays from its overflow check rather than prepping twice)."""
        ids1, cnt1, dir_fs, _, Q = pad_query_stream(
            ids1, cnt1, np.asarray(dir_fs, np.int32), batch, self.content.V
        )
        ids2, cnt2, _, _, _ = pad_query_stream(
            ids2, cnt2, None, batch, self.path.V
        )
        tv1, ti1, tv2, ti2 = _dual_resident_score_topk_stream(
            self._args(self.content), self._args(self.path),
            jnp.asarray(ids1), jnp.asarray(cnt1),
            jnp.asarray(ids2), jnp.asarray(cnt2),
            jnp.asarray(dir_fs),
            k1=k_content, k2=k_path, num_docs=self.content.num_docs,
            light_cap1=self.content.light_cap, light_cap2=self.path.light_cap,
            P1=self.content.P, P2=self.path.P,
            tail1=self.content.tail, tail2=self.path.tail,
            light1=self.content.light_layout, light2=self.path.light_layout,
            light_t1=self.content.light_t_bound(ids1),
            light_t2=self.path.light_t_bound(ids2),
        )
        tv1, ti1, tv2, ti2 = jax.device_get((tv1, ti1, tv2, ti2))

        def strip(a):
            return a.reshape(-1, a.shape[-1])[:Q]

        return (strip(tv1), strip(ti1)), (strip(tv2), strip(ti2))


@functools.partial(
    jax.jit,
    static_argnames=(
        "k1", "k2", "num_docs", "light_cap1", "light_cap2", "P1", "P2",
        "tail1", "tail2", "light1", "light2", "light_t1", "light_t2",
    ),
)
def _dual_resident_score_topk_stream(
    args1, args2, term_ids1, counts1, term_ids2, counts2, dir_filter,
    *, k1: int, k2: int, num_docs: int,
    light_cap1: int, light_cap2: int, P1: int, P2: int,
    tail1: str = "xla", tail2: str = "xla",
    light1: str = "csr", light2: str = "csr",
    light_t1: Optional[int] = None, light_t2: Optional[int] = None,
):
    """Scan-over-batches form of :func:`_dual_resident_score_topk`:
    ``term_ids*/counts*`` are ``[NB, B, T]``, ``dir_filter`` ``[NB, B]``."""

    def step(_, inp):
        i1, c1, i2, c2, df = inp
        tv1, ti1, tv2, ti2 = _dual_resident_score_topk(
            args1, args2, i1, c1, i2, c2, df,
            k1=k1, k2=k2, num_docs=num_docs,
            light_cap1=light_cap1, light_cap2=light_cap2, P1=P1, P2=P2,
            tail1=tail1, tail2=tail2, light1=light1, light2=light2,
            light_t1=light_t1, light_t2=light_t2,
        )
        return 0, (tv1, ti1, tv2, ti2)

    _, outs = jax.lax.scan(
        step, 0, (term_ids1, counts1, term_ids2, counts2, dir_filter)
    )
    return outs
