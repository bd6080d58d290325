"""Honest component timings on the attached TPU.

``block_until_ready`` does not synchronize on the axon remote backend, so
every measurement here forces completion with a 4-byte scalar readback
chained onto the op's outputs, and reports marginal cost from op-count
scaling where possible. Run: python tools/profile_ops.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=10):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    per = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {per:.2f} ms")
    return per


def main():
    import jax
    import jax.numpy as jnp

    B, N, K, H, T, C = 32, 20000, 192, 512, 16, 2048
    rng = np.random.default_rng(0)

    # round-trip floor
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_nop = jax.jit(lambda x: x.sum())
    rt = timeit("round trip (nop+scalar)", lambda: float(f_nop(tiny)))

    scores = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))

    f_topk = jax.jit(lambda s: jax.lax.top_k(s, K)[1].sum())
    timeit(f"top_k [B={B},N={N}] k={K}", lambda: int(f_topk(scores)))

    from easyrag_tpu.ops.topk import topk_desc_reference_order

    f_rtopk = jax.jit(lambda s: topk_desc_reference_order(s, K)[1].sum())
    timeit("ref-order top_k", lambda: int(f_rtopk(scores)))

    heavy = jnp.asarray(rng.normal(size=(H, N)).astype(np.float32))
    A = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    f_hm = jax.jit(
        lambda a, h: jax.lax.dot_general(
            a, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).sum()
    )
    timeit(f"heavy matmul f32 HIGHEST [{B}x{H}]@[{H}x{N}]", lambda: float(f_hm(A, heavy)))
    f_hm2 = jax.jit(
        lambda a, h: jax.lax.dot_general(
            a, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).sum()
    )
    timeit("heavy matmul default precision", lambda: float(f_hm2(A, heavy)))

    # gather + scatter (the light path)
    P = 2_000_000
    post_docs = jnp.asarray(rng.integers(0, N, P + 1).astype(np.int32))
    post_vals = jnp.asarray(rng.random(P + 1).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, P, (B, T, C)).astype(np.int32))

    f_gather = jax.jit(lambda p: (post_docs[p].sum() + post_vals[p].sum()))
    timeit(f"gather [B,T,C]={B}x{T}x{C} x2 arrays", lambda: float(f_gather(pos)))

    def scatter_fn(p):
        docs = post_docs[p]
        vals = post_vals[p]
        b3 = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, T, C))
        s = jnp.zeros((B, N), jnp.float32)
        s = s.at[b3.reshape(B, -1), docs.reshape(B, -1)].add(
            vals.reshape(B, -1), mode="drop"
        )
        return s.sum()

    f_scatter = jax.jit(scatter_fn)
    timeit("gather+scatter-add into [B,N]", lambda: float(f_scatter(pos)))

    # full resident kernel
    from easyrag_tpu.index.sparse import build_sparse_index
    from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex
    from bench import make_corpus, make_queries

    corpus = make_corpus(np.random.default_rng(0))
    queries = make_queries(np.random.default_rng(0), corpus)
    index = build_sparse_index(corpus, bm25_type=0)
    resident = ResidentSparseIndex(index, light_cap=C, max_query_terms=T)
    ids = jnp.asarray(np.stack([resident.query_terms(q)[0] for q in queries[:B]]))
    cnts = jnp.asarray(np.stack([resident.query_terms(q)[1] for q in queries[:B]]))
    print(f"resident: H={resident.heavy.shape[0]}, P={resident.P}")

    f_res = jax.jit(
        lambda i, c: resident._score_topk(i, c, K)[1].astype(jnp.int32).sum()
    )
    per = timeit(f"resident score+topk batch={B}", lambda: int(f_res(ids, cnts)))
    print(f"-> {B / ((per - rt) / 1000):.0f} qps device-side (excl round trip)")


if __name__ == "__main__":
    main()
