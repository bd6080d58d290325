"""ICI-sharded index query: per-shard scoring + local top-k + all-gather merge.

The query path the scaling book prescribes, applied to retrieval:

* the corpus axis (docs) is sharded over the mesh's "data" axis — the dense
  embedding matrix by rows, the sparse score vector by doc ranges;
* the query is replicated;
* each shard computes local scores and a *local* top-k (k candidates per
  shard, not the full score vector) — so the ICI all-gather moves
  ``devices × k`` candidates instead of ``N`` scores;
* a replicated global top-k over the gathered candidates finishes the job.

Index offsets are recovered from ``jax.lax.axis_index``. Results are
bit-identical to the single-chip path for distinct scores; tie ordering
follows the same deterministic descending-index policy (global doc index).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops.topk import topk_desc_reference_order

NEG_INF = float("-inf")  # host constant: a jnp scalar here would initialize
# the XLA backend at import time, breaking jax.distributed.initialize ordering


def _merge_global_topk(local_vals, local_idx, axis: str, k: int):
    """all-gather per-shard candidates and take a replicated global top-k.

    local_vals/local_idx: [B, k] per shard with *global* doc indices.
    """
    vals = jax.lax.all_gather(local_vals, axis, axis=0)  # [D, B, k]
    idx = jax.lax.all_gather(local_idx, axis, axis=0)
    d, b, kk = vals.shape
    vals = jnp.moveaxis(vals, 0, 1).reshape(b, d * kk)
    idx = jnp.moveaxis(idx, 0, 1).reshape(b, d * kk)
    # global tie policy = descending doc index: order candidates by index
    # descending so positional ties resolve identically to single-chip
    order = jnp.argsort(-idx, axis=1)
    vals = jnp.take_along_axis(vals, order, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    top_vals, pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idx, pos, axis=1)


class ShardedDenseIndex:
    """Row-sharded HBM cosine index over a mesh "data" axis."""

    def __init__(
        self, mesh: Mesh, matrix: np.ndarray, dtype=jnp.bfloat16,
        dir_ids: np.ndarray = None, dir_vocab=None,
        scales: np.ndarray = None,
    ) -> None:
        """``matrix`` is host rows: normalized f32 (cast to ``dtype``), or
        already-quantized int8 when ``scales`` (per-row f32) is given —
        the exact arrays a single-chip ``DenseIndex`` holds, row-sharded."""
        self.mesh = mesh
        self.dir_vocab = dir_vocab or {}
        n_shards = mesh.shape["data"]
        n, d = matrix.shape
        self.num_docs = n
        self.pad_n = ((n + n_shards - 1) // n_shards) * n_shards
        sharding = NamedSharding(mesh, P("data", None))
        self.shard_size = self.pad_n // n_shards
        self.scales = None
        if scales is not None:  # int8 rows + per-row scales
            padded = np.zeros((self.pad_n, d), dtype=np.int8)
            padded[:n] = matrix
            self.matrix = jax.device_put(jnp.asarray(padded), sharding)
            sc_pad = np.ones((self.pad_n,), np.float32)
            sc_pad[:n] = scales
            self.scales = jax.device_put(
                jnp.asarray(sc_pad.reshape(n_shards, self.shard_size)),
                sharding,
            )
        else:
            padded = np.zeros((self.pad_n, d), dtype=np.float32)
            padded[:n] = matrix
            self.matrix = jax.device_put(
                jnp.asarray(padded, dtype=dtype), sharding
            )
        # optional metadata column for the `dir` equality filter, row-sharded
        self.dir_col = None
        if dir_ids is not None:
            dirs_pad = np.full((self.pad_n,), -3, np.int32)  # pad rows match nothing
            dirs_pad[:n] = dir_ids
            self.dir_col = jax.device_put(
                jnp.asarray(dirs_pad.reshape(n_shards, self.shard_size)),
                NamedSharding(mesh, P("data", None)),
            )

    @classmethod
    def from_arrays(
        cls, mesh: Mesh, matrix, scales, dir_ids, dir_vocab, dtype: str,
    ) -> "ShardedDenseIndex":
        """Construct from the host arrays ``prepare_dense_arrays`` /
        ``load_dense_arrays`` produce — the one build recipe the pipeline,
        :meth:`build` and :meth:`load` all share. (``dtype`` is ignored for
        int8 rows: ``scales`` implies the stored-int8 layout.)"""
        return cls(
            mesh, matrix, dtype=jnp.dtype(dtype), dir_ids=dir_ids,
            dir_vocab=dir_vocab, scales=scales,
        )

    @classmethod
    def build(
        cls, mesh: Mesh, embeddings: np.ndarray, dirs=None,
        dtype: str = "bfloat16",
    ) -> "ShardedDenseIndex":
        """Build directly from host embeddings — shards go straight to
        their devices; the full matrix never lands on a single chip (the
        point of sharding: corpora past one chip's HBM)."""
        from ..index.dense import prepare_dense_arrays

        return cls.from_arrays(
            mesh, *prepare_dense_arrays(embeddings, dirs, dtype), dtype
        )

    @classmethod
    def load(cls, mesh: Mesh, path: str) -> "ShardedDenseIndex":
        """Load the on-disk artifact (``DenseIndex`` format) host-side and
        shard it — no single-device materialization."""
        from ..index.dense import load_dense_arrays

        matrix, scales, dir_ids, dir_vocab, dtype = load_dense_arrays(path)
        return cls.from_arrays(mesh, matrix, scales, dir_ids, dir_vocab, dtype)

    # NOTE: self stays a static jit arg for mesh/shape metadata, but the
    # big arrays are passed explicitly — a static self would bake them into
    # the compile payload as literals (measured: HTTP 413 on the remote
    # compiler and multi-minute compiles)
    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _query_impl(
        self, matrix, dir_col, q: jnp.ndarray, k: int,
        dir_filter: jnp.ndarray = None, scales=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mesh = self.mesh
        shard_size = self.shard_size
        num_docs = self.num_docs
        with_filter = dir_col is not None and dir_filter is not None
        is_int8 = matrix.dtype == jnp.int8

        def shard_fn(matrix_local, q_rep, *rest):
            lo = jax.lax.axis_index("data") * shard_size
            rest = list(rest)
            scales_local = rest.pop(0)[0] if is_int8 else None
            if is_int8:
                # the single-chip int8 contract (index/dense.py): quantize
                # the replicated query per row, s8 x s8 -> s32 on the MXU,
                # rescale by q_scale * per-row scales — every shard sees
                # the same q8, so scores match the single-chip path
                q_scale = jnp.max(jnp.abs(q_rep), axis=1, keepdims=True) / 127.0
                q8 = jnp.clip(
                    jnp.round(q_rep / jnp.maximum(q_scale, 1e-12)), -127, 127
                ).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    q8,
                    matrix_local,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                scores = acc.astype(jnp.float32) * q_scale * scales_local[None, :]
            else:
                scores = jax.lax.dot_general(
                    q_rep.astype(matrix_local.dtype),
                    matrix_local,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [B, shard]
            # mask padded rows
            local_ids = lo + jax.lax.broadcasted_iota(
                jnp.int32, (1, shard_size), 1
            )
            scores = jnp.where(local_ids < num_docs, scores, NEG_INF)
            if with_filter:
                dir_local, dir_f = rest
                keep = jnp.logical_or(
                    dir_f[:, None] == -1, dir_local[0][None, :] == dir_f[:, None]
                )
                scores = jnp.where(keep, scores, NEG_INF)
            lv, li = topk_desc_reference_order(scores, min(k, shard_size))
            gv, gi = _merge_global_topk(lv, li + lo, "data", k)
            # sentinel contract (index/dense.py): -inf entries carry index
            # num_docs, so HBM pad rows never leak into the output ties
            return gv, jnp.where(jnp.isfinite(gv), gi, num_docs)

        in_specs = [P("data", None), P(None, None)]
        args = [matrix, q]
        if is_int8:
            in_specs.append(P("data", None))
            args.append(scales)
        if with_filter:
            in_specs += [P("data", None), P(None)]
            args += [dir_col, dir_filter]
        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )(*args)

    def _query(self, q: jnp.ndarray, k: int, dir_filter=None):
        return self._query_impl(
            self.matrix, self.dir_col, q, k, dir_filter, self.scales
        )

    @classmethod
    def from_dense(cls, mesh: Mesh, dense) -> "ShardedDenseIndex":
        """Shard a built/loaded single-chip :class:`DenseIndex` over the
        mesh, keeping its exact stored rows (incl. int8 rows + scales, so
        scores match the single-chip path bit for bit); the result is a
        drop-in for ``DenseRetriever`` — same ``query(dir_value=...)`` /
        ``query_stream(dir_values=...)`` surface. Prefer
        :meth:`build`/:meth:`load` when no device index exists yet — this
        path downloads the matrix from the first device."""
        return cls(
            mesh,
            np.asarray(dense.matrix),
            dtype=dense.matrix.dtype,
            dir_ids=dense.dir_ids,
            dir_vocab=dense.dir_vocab,
            scales=np.asarray(dense.scales, np.float32)
            if dense.scales is not None
            else None,
        )

    def query(
        self, q: np.ndarray, k: int, dir_filter: np.ndarray = None,
        dir_value=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """``dir_filter`` takes per-row int filter ids; ``dir_value`` takes
        a dir NAME applied to every row (the ``DenseIndex.query`` contract,
        so the sharded index drops into ``DenseRetriever``)."""
        from ..index.dense import l2_normalize

        q = l2_normalize(np.atleast_2d(np.asarray(q, dtype=np.float32)))
        dir_f = None
        if dir_filter is not None:
            dir_f = jnp.asarray(dir_filter)
        elif self.dir_col is not None:
            fid = self.dir_vocab.get(dir_value, -2) if dir_value else -1
            dir_f = jnp.full((q.shape[0],), fid, dtype=jnp.int32)
        vals, idx = self._query(jnp.asarray(q), k, dir_f)
        return np.asarray(vals), np.asarray(idx)

    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _stream_impl(self, matrix, dir_col, q, k: int, dir_filter=None,
                     scales=None):
        """Scan-over-batches form of :meth:`_query_impl`: the whole query
        stream in one dispatch over the mesh. ``q`` is ``[NB, B, D]``."""

        def step(_, inp):
            qb, *df = inp
            v, i = self._query_impl(
                matrix, dir_col, qb, k, df[0] if df else None, scales
            )
            return 0, (v, i)

        xs = (q,) if dir_filter is None else (q, dir_filter)
        _, (vs, ix) = jax.lax.scan(step, 0, xs)
        return vs, ix

    def query_stream(
        self,
        query_embs: np.ndarray,  # [Q, D]
        k: int,
        dir_values=None,  # per-row dir names (or None)
        batch: int = 64,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Whole query set in one compiled dispatch over the mesh; results
        identical to row-wise :meth:`query`, tail padding stripped — the
        ``DenseIndex.query_stream`` contract."""
        from ..index.dense import pad_dense_query_stream

        q, dir_f, Q = pad_dense_query_stream(
            query_embs, dir_values, self.dir_vocab,
            self.dir_col is not None, batch,
        )
        vs, ix = self._stream_impl(
            self.matrix, self.dir_col, jnp.asarray(q), k,
            jnp.asarray(dir_f) if dir_f is not None else None,
            self.scales,
        )
        vs, ix = jax.device_get((vs, ix))
        return vs.reshape(-1, k)[:Q], ix.reshape(-1, k)[:Q]


class ShardedResidentSparseIndex:
    """Doc-range-sharded *device-resident* BM25 index.

    The single-chip flagship design (``ops/bm25_resident.py``) sharded over
    the mesh "data" axis: each shard holds its doc-range slice of the heavy
    score matrix ``[H, N/D]`` and the light postings that fall in its range
    (re-packed per shard so every term's in-range window stays bounded).
    Queries are replicated (term ids + counts, KBs); each shard scores its
    slice, takes a local top-k, and the candidates all-gather into a
    replicated global top-k. Corpora beyond one chip's HBM scale linearly.
    """

    def __init__(self, mesh: Mesh, index, light_cap=None, max_query_terms: int = 64,
                 heavy_hbm_budget: int = 512 * 1024 * 1024,
                 heavy_dtype: str = "float32",
                 light_rows: "bool | None" = None,
                 light_rows_hbm_budget: int = 256 * 1024 * 1024):
        from ..ops.bm25_resident import ResidentSparseIndex

        if heavy_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unsupported heavy_dtype {heavy_dtype!r}")
        self.mesh = mesh
        self.host_index = index
        self.dir_vocab = index.dir_vocab
        self.num_docs = index.num_docs
        self.max_query_terms = max_query_terms
        self.heavy_dtype = heavy_dtype
        itemsize = {"float32": 4, "bfloat16": 2, "int8": 1}[heavy_dtype]
        n_shards = mesh.shape["data"]
        self.shard_size = (index.num_docs + n_shards - 1) // n_shards

        offs = index.stats.term_offsets
        lens = np.diff(offs).astype(np.int64)
        V = len(lens)
        self.V = V
        if light_cap is None:
            # same cost-model policy as single-chip (ops/bm25_resident.py
            # ``auto_light_cap``), incl. the rows-aware tail constant:
            # pick under the rows model first, re-pick with the CSR
            # constant if the rows table won't fit its per-shard budget.
            # Per-shard doc count, per-shard budgets. When NO cap fits,
            # the fallback of shard_size gives the minimum FEASIBLE heavy
            # set (terms whose global df exceeds the per-shard window
            # bound must stay heavy for correctness) — that minimum may
            # still exceed an unsatisfiably small budget.
            from ..ops.bm25_resident import auto_light_cap

            cap = auto_light_cap(
                lens, self.shard_size, itemsize, heavy_hbm_budget,
                max_query_terms, kappa_scale=0.5,
            )
            rows_ok = light_rows is not False and (
                (V + 1) * cap * 8 <= light_rows_hbm_budget
            )
            if not rows_ok:
                cap = auto_light_cap(
                    lens, self.shard_size, itemsize, heavy_hbm_budget,
                    max_query_terms,
                )
            light_cap = cap
        self.light_cap = light_cap

        # shard-local re-pack: postings split by doc range; per-shard CSR
        docs = index.stats.post_docs
        vals = index.post_vals.astype(np.float32)
        terms = np.repeat(np.arange(V, dtype=np.int64), lens)
        shard_of = docs // self.shard_size

        # same criterion as single-chip: a term with global df <= light_cap
        # can never exceed the per-shard window either
        heavy_terms = np.where(lens > light_cap)[0]
        is_heavy = np.zeros(V + 1, bool)
        is_heavy[heavy_terms] = True
        # global light lens for the (delegated) query prep: heavy terms 0
        host_light = np.zeros(V + 1, np.int64)
        host_light[:V] = lens
        host_light[heavy_terms] = 0
        self._host_light_lens = host_light
        H = max(((len(heavy_terms) + 7) // 8) * 8, 8)
        heavy_row = np.full(V + 1, -1, dtype=np.int32)
        heavy_row[heavy_terms] = np.arange(len(heavy_terms))

        pad_n = self.shard_size * n_shards
        heavy_full = np.zeros((H, pad_n), dtype=np.float32)
        for row, t in enumerate(heavy_terms):
            lo, hi = offs[t], offs[t + 1]
            heavy_full[row, docs[lo:hi]] = vals[lo:hi]

        # per-shard light CSR (padded to the max shard postings count)
        light_sel = ~is_heavy[terms]
        starts_sh, lens_sh, docs_sh, vals_sh = [], [], [], []
        max_p = 1
        for sh in range(n_shards):
            sel = light_sel & (shard_of == sh)
            t_sh, d_sh, v_sh = terms[sel], docs[sel], vals[sel]
            order = np.argsort(t_sh, kind="stable")
            t_sh, d_sh, v_sh = t_sh[order], d_sh[order], v_sh[order]
            cnt = np.bincount(t_sh, minlength=V).astype(np.int32)
            st = np.zeros(V + 1, np.int32)
            np.cumsum(cnt, out=st[1:V + 1])
            starts_sh.append(st[:V + 1])
            lens_full = np.zeros(V + 1, np.int32)
            lens_full[:V] = cnt
            lens_sh.append(lens_full)
            docs_sh.append(d_sh.astype(np.int32))
            vals_sh.append(v_sh)
            max_p = max(max_p, len(d_sh))
        docs_pad = np.full((n_shards, max_p + 1), index.num_docs, np.int32)
        vals_pad = np.zeros((n_shards, max_p + 1), np.float32)
        starts_arr = np.zeros((n_shards, V + 1), np.int32)
        lens_arr = np.zeros((n_shards, V + 1), np.int32)
        for sh in range(n_shards):
            docs_pad[sh, : len(docs_sh[sh])] = docs_sh[sh]
            vals_pad[sh, : len(vals_sh[sh])] = vals_sh[sh]
            starts_arr[sh] = starts_sh[sh]
            lens_arr[sh] = lens_sh[sh]
        self.max_p = max_p

        # dir metadata column, row-sharded (pad rows match nothing)
        self.dir_col = None
        if index.dir_ids is not None:
            dirs_pad = np.full((pad_n,), -3, np.int32)
            dirs_pad[: index.num_docs] = index.dir_ids
            self.dir_col = jax.device_put(
                jnp.asarray(dirs_pad.reshape(n_shards, self.shard_size)),
                NamedSharding(mesh, P("data", None)),
            )

        # light layout (same trade as single-chip ops/bm25_resident.py):
        # "rows" pre-gathers each term's PER-SHARD window into a padded
        # [V+1, C] table per shard (one row gather per (query, term) at
        # score time); per-shard cost (V+1)*C*8 bytes.
        table_bytes = (V + 1) * light_cap * 8
        if light_rows is None:
            light_rows = table_bytes <= light_rows_hbm_budget
        self.light_layout = "rows" if light_rows else "csr"
        rows_docs = rows_vals = None
        if light_rows:
            win = np.arange(light_cap, dtype=np.int64)[None, :]
            rows_docs = np.empty((n_shards, V + 1, light_cap), np.int32)
            rows_vals = np.empty((n_shards, V + 1, light_cap), np.float32)
            for sh in range(n_shards):
                st = starts_arr[sh].astype(np.int64)
                ln = lens_arr[sh].astype(np.int64)
                valid = win < ln[:, None]
                # sentinel slot: last index of the padded posting arrays
                pos = np.where(valid, st[:, None] + win, docs_pad.shape[1] - 1)
                rows_docs[sh] = docs_pad[sh][pos]
                rows_vals[sh] = np.where(valid, vals_pad[sh][pos], 0.0)

        ds = NamedSharding(mesh, P("data", None))
        # compressed heavy dtypes, same semantics as the single-chip index
        # (ops/bm25_resident.py): int8 quantizes per DOC COLUMN over the
        # same global heavy-term set, so scales — and scores — are
        # identical to the single-chip int8 path (pad columns scale 1.0)
        self.heavy_scales = None
        if heavy_dtype == "int8":
            col_max = np.abs(heavy_full).max(axis=0)
            scales = np.where(col_max > 0, col_max / 127.0, 1.0).astype(
                np.float32
            )
            heavy_full = np.rint(heavy_full / scales[None, :]).astype(np.int8)
            self.heavy_scales = jax.device_put(
                jnp.asarray(scales.reshape(n_shards, self.shard_size)), ds
            )
        elif heavy_dtype == "bfloat16":
            heavy_full = heavy_full.astype(jnp.bfloat16)
        self.heavy = jax.device_put(
            jnp.asarray(heavy_full.reshape(H, n_shards, self.shard_size)
                        .transpose(1, 0, 2).reshape(n_shards * H, self.shard_size)),
            ds,
        )  # [D*H, shard] sharded on axis 0 -> each device holds [H, shard]
        self.H = H
        self.t_heavy_row = jnp.asarray(heavy_row)
        self.t_starts = jax.device_put(jnp.asarray(starts_arr), ds)
        self.t_lens = jax.device_put(jnp.asarray(lens_arr), ds)
        if light_rows:
            # device_put straight from host numpy: jnp.asarray first would
            # land the full (n_shards, V+1, C) tables on one device before
            # resharding — the OOM the per-shard budget exists to prevent
            ds3 = NamedSharding(mesh, P("data", None, None))
            self.post_docs = jax.device_put(rows_docs, ds3)
            self.post_vals = jax.device_put(rows_vals, ds3)
        else:
            self.post_docs = jax.device_put(jnp.asarray(docs_pad), ds)
            self.post_vals = jax.device_put(jnp.asarray(vals_pad), ds)

    def query_terms(self, query_tokens):
        from ..ops.bm25_resident import ResidentSparseIndex

        return ResidentSparseIndex.query_terms(self, query_tokens)

    def query_terms_batch(self, queries_tokens):
        from ..ops.bm25_resident import ResidentSparseIndex

        return ResidentSparseIndex.query_terms_batch(self, queries_tokens)

    def light_t_bound(self, ids):
        from ..ops.bm25_resident import ResidentSparseIndex

        return ResidentSparseIndex.light_t_bound(self, ids)

    @functools.partial(jax.jit, static_argnames=("self", "k", "light_t"))
    def _score_topk_impl(
        self, heavy, t_starts, t_lens, post_docs, post_vals, t_heavy_row,
        dir_col, term_ids, counts, k: int, dir_filter=None,
        heavy_scales=None, light_t=None,
    ):
        shard_size, num_docs = self.shard_size, self.num_docs
        H, C, P_pad = self.H, self.light_cap, self.max_p
        with_filter = dir_col is not None and dir_filter is not None
        is_int8 = self.heavy_dtype == "int8"
        light_rows = self.light_layout == "rows"

        def shard_fn(heavy, starts, lens, pdocs, pvals, heavy_row, tids, cnts, *rest):
            B, T = tids.shape
            lo = jax.lax.axis_index("data") * shard_size
            heavy = heavy.reshape(H, shard_size)
            starts, lens = starts[0], lens[0]
            pdocs, pvals = pdocs[0], pvals[0]
            rest = list(rest)
            scales_local = rest.pop(0)[0] if is_int8 else None

            hrow = heavy_row[tids]  # noqa — replicated lookup table
            if B * T < H:
                # row gather + einsum: reads only the B*T referenced rows of
                # the per-shard heavy slice instead of re-streaming all H
                # rows per batch (1.7x at H=3072, H-independent — r3,
                # tools/exp_sparse_heavy.py; same f32 rounding class)
                rr = jnp.where(hrow >= 0, hrow, 0)
                w = jnp.where(hrow >= 0, cnts, 0.0)
                g = heavy[rr]  # [B, T, shard]
                if is_int8:
                    scores = jnp.einsum(
                        "bt,btn->bn", w, g.astype(jnp.float32)
                    ) * scales_local[None, :]
                else:
                    scores = jnp.einsum(
                        "bt,btn->bn", w, g.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST,
                    )
            else:
                hrow_or_drop = jnp.where(hrow >= 0, hrow, H)
                A = jnp.zeros((B, H), jnp.float32)
                b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
                A = A.at[b_idx, hrow_or_drop].add(
                    jnp.where(hrow >= 0, cnts, 0.0), mode="drop"
                )
                dims = (((1,), (0,)), ((), ()))
                if is_int8:
                    # s8 x s8 -> s32, per-doc-column rescale: the single-chip
                    # int8 contract (ops/bm25_resident.py)
                    scores = jax.lax.dot_general(
                        jnp.clip(A, 0, 127).astype(jnp.int8), heavy,
                        dimension_numbers=dims,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * scales_local[None, :]
                elif heavy.dtype == jnp.bfloat16:
                    scores = jax.lax.dot_general(
                        A.astype(jnp.bfloat16), heavy, dimension_numbers=dims,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    scores = jax.lax.dot_general(
                        A, heavy, dimension_numbers=dims,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, shard]

            # light part, sliced to the light-term prefix (host prep
            # orders light terms first; light_t_bound covers any order)
            TL = light_t if light_t is not None else T
            lt_ids = tids[:, :TL]
            lt_cnts = cnts[:, :TL]
            if light_rows:
                # padded [V+1, C] per-shard tables: one row gather per
                # (query, term); pad slots carry global doc id num_docs
                docs_g = pdocs[lt_ids]  # [B, TL, C]
                vals_g = pvals[lt_ids] * lt_cnts[:, :, None]
            else:
                st = starts[lt_ids]
                ln = lens[lt_ids]
                win = jnp.arange(C, dtype=jnp.int32)[None, None, :]
                valid = win < ln[:, :, None]
                pos = jnp.where(valid, st[:, :, None] + win, P_pad)
                docs_g = pdocs[pos]  # sentinel -> num_docs, val 0.0
                vals_g = pvals[pos] * lt_cnts[:, :, None]
            docs_local = docs_g - lo
            in_shard = (docs_local >= 0) & (docs_local < shard_size)
            # flat-index scatter into the raveled scores alias (6.8 vs
            # 10.2 ns/slot for the batched 2-D form — r3 exp_scatter.py);
            # out-of-shard/sentinel slots route OOB and drop
            b_off = (jnp.arange(B, dtype=jnp.int32) * shard_size)[:, None, None]
            flat_idx = jnp.where(in_shard, b_off + docs_local, B * shard_size)
            scores = (
                scores.reshape(B * shard_size)
                .at[flat_idx.reshape(-1)]
                .add(vals_g.reshape(-1), mode="drop")
                .reshape(B, shard_size)
            )

            local_ids = lo + jax.lax.broadcasted_iota(jnp.int32, (1, shard_size), 1)
            scores = jnp.where(local_ids < num_docs, scores, NEG_INF)
            if with_filter:
                dir_local, dir_f = rest
                keep = jnp.logical_or(
                    dir_f[:, None] == -1, dir_local[0][None, :] == dir_f[:, None]
                )
                scores = jnp.where(keep, scores, NEG_INF)
            scores = jnp.where(scores > 0, scores, NEG_INF)
            lv, li = topk_desc_reference_order(scores, min(k, shard_size))
            gv, gi = _merge_global_topk(lv, li + lo, "data", k)
            # single-chip sentinel contract: -inf entries carry index N
            return gv, jnp.where(jnp.isfinite(gv), gi, num_docs)

        post_spec = (
            P("data", None, None) if light_rows else P("data", None)
        )
        in_specs = [
            P("data", None), P("data", None), P("data", None),
            post_spec, post_spec, P(None),
            P(None, None), P(None, None),
        ]
        args = [
            heavy, t_starts, t_lens, post_docs,
            post_vals, t_heavy_row, term_ids, counts,
        ]
        if is_int8:
            in_specs.append(P("data", None))
            args.append(heavy_scales)
        if with_filter:
            in_specs += [P("data", None), P(None)]
            args += [dir_col, dir_filter]
        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )(*args)

    def _score_topk(self, term_ids, counts, k: int, dir_filter=None,
                    light_t=None):
        return self._score_topk_impl(
            self.heavy, self.t_starts, self.t_lens, self.post_docs,
            self.post_vals, self.t_heavy_row, self.dir_col,
            term_ids, counts, k, dir_filter, self.heavy_scales, light_t,
        )

    def score_topk(self, queries_tokens, k: int, dir_values=None):
        ids, cnts = self.query_terms_batch(queries_tokens)
        dir_f = None
        if dir_values is not None and self.dir_col is not None:
            dir_f = jnp.asarray(
                np.array(
                    [self.dir_vocab.get(d, -2) if d else -1 for d in dir_values],
                    dtype=np.int32,
                )
            )
        tv, ti = self._score_topk(jnp.asarray(ids), jnp.asarray(cnts), k, dir_f)
        return np.asarray(tv), np.asarray(ti)

    @functools.partial(jax.jit, static_argnames=("self", "k", "light_t"))
    def _stream_impl(
        self, heavy, t_starts, t_lens, post_docs, post_vals, t_heavy_row,
        dir_col, term_ids, counts, k: int, dir_filter=None,
        heavy_scales=None, light_t=None,
    ):
        """Scan-over-batches form of :meth:`_score_topk_impl` — the whole
        query stream in one dispatch, mirroring the single-chip
        ``_resident_score_topk_stream``. ``term_ids``/``counts`` are
        ``[NB, B, T]``, ``dir_filter`` ``[NB, B]`` or None."""

        def step(_, inp):
            ids, cnts, *df = inp
            tv, ti = self._score_topk_impl(
                heavy, t_starts, t_lens, post_docs, post_vals, t_heavy_row,
                dir_col, ids, cnts, k, df[0] if df else None, heavy_scales,
                light_t,
            )
            return 0, (tv, ti)

        xs = (term_ids, counts)
        if dir_filter is not None:
            xs = xs + (dir_filter,)
        _, (tvs, tis) = jax.lax.scan(step, 0, xs)
        return tvs, tis, tis.sum()

    def stream_from_arrays(
        self,
        ids: np.ndarray,  # [Q, T] int32 term ids (sentinel-padded rows)
        cnts: np.ndarray,  # [Q, T] f32
        dir_f,  # [Q] int32 or None
        k: int,
        batch: int = 64,
    ):
        """Lower-level stream entry matching the single-chip
        ``ResidentSparseIndex.stream_from_arrays`` contract, so the sharded
        index is a drop-in ``_resident`` for ``BM25Retriever``. Returns
        ``(tvs [NB,B,k], tis, checksum, Q)`` with results still on device."""
        from ..ops.bm25_resident import pad_query_stream

        ids, cnts, dir_f, _, Q = pad_query_stream(
            ids, cnts, dir_f, batch, self.V
        )
        tvs, tis, checksum = self._stream_impl(
            self.heavy, self.t_starts, self.t_lens, self.post_docs,
            self.post_vals, self.t_heavy_row, self.dir_col,
            jnp.asarray(ids), jnp.asarray(cnts), k,
            jnp.asarray(dir_f) if dir_f is not None else None,
            self.heavy_scales, self.light_t_bound(ids),
        )
        return tvs, tis, checksum, Q

    def stream_score_topk(
        self, queries_tokens, k: int, batch: int = 64, dir_values=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Whole query set in one compiled dispatch over the mesh; results
        identical to :meth:`score_topk`, tail padding stripped."""
        Q = len(queries_tokens)
        ids, cnts = self.query_terms_batch(queries_tokens)
        dir_f = None
        if dir_values is not None and self.dir_col is not None:
            dir_f = np.array(
                [self.dir_vocab.get(d, -2) if d else -1 for d in dir_values],
                dtype=np.int32,
            )
        tvs, tis, _, _ = self.stream_from_arrays(
            ids, cnts, dir_f, k, batch=batch
        )
        tvs, tis = jax.device_get((tvs, tis))
        kk = tvs.shape[-1]
        return tvs.reshape(-1, kk)[:Q], tis.reshape(-1, kk)[:Q]


class ShardedSparseScorer:
    """Doc-range-sharded BM25 scoring (gathered-postings form).

    The gathered postings buffer is replicated (it is small: ≤ a few 100KB
    per query batch); each shard scatter-adds only the postings whose doc id
    falls in its range, producing its slice of the score vector, then local
    top-k + global merge as in the dense path.
    """

    def __init__(self, mesh: Mesh, num_docs: int) -> None:
        self.mesh = mesh
        self.num_docs = num_docs
        n_shards = mesh.shape["data"]
        self.shard_size = ((num_docs + n_shards - 1) // n_shards)

    @functools.partial(jax.jit, static_argnames=("self", "k"))
    def _score_topk(
        self, doc_ids: jnp.ndarray, vals: jnp.ndarray, k: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        shard_size = self.shard_size
        num_docs = self.num_docs

        def shard_fn(ids_rep, vals_rep):
            lo = jax.lax.axis_index("data") * shard_size
            local = ids_rep - lo
            B = ids_rep.shape[0]
            # flat-index scatter (see _score_topk_impl): out-of-range slots
            # route to the OOB index and drop
            in_range = (local >= 0) & (local < shard_size)
            b_off = (jnp.arange(B, dtype=jnp.int32) * shard_size)[:, None]
            flat_idx = jnp.where(in_range, b_off + local, B * shard_size)
            scores = (
                jnp.zeros((B * shard_size,), jnp.float32)
                .at[flat_idx.reshape(-1)]
                .add(vals_rep.reshape(-1), mode="drop")
                .reshape(B, shard_size)
            )
            local_ids = lo + jax.lax.broadcasted_iota(jnp.int32, (1, shard_size), 1)
            scores = jnp.where(local_ids < num_docs, scores, NEG_INF)
            scores = jnp.where(scores > 0, scores, NEG_INF)
            lv, li = topk_desc_reference_order(scores, min(k, shard_size))
            gv, gi = _merge_global_topk(lv, li + lo, "data", k)
            # single-chip sentinel contract: -inf entries carry index N
            return gv, jnp.where(jnp.isfinite(gv), gi, num_docs)

        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(None, None), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )(doc_ids, vals)

    def score_topk(
        self, doc_ids: np.ndarray, vals: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        doc_ids = np.atleast_2d(doc_ids)
        vals = np.atleast_2d(vals)
        tv, ti = self._score_topk(jnp.asarray(doc_ids), jnp.asarray(vals), k)
        return np.asarray(tv), np.asarray(ti)
