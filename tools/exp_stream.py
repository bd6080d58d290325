"""One-off experiment: per-batch dispatch vs one-dispatch stream scoring
on the real chip, at bench.py shapes. Times use the chained-checksum
barrier (block_until_ready does not sync on this attachment)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, N_QUERIES, TOPK, make_corpus, make_queries  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from easyrag_tpu.index.sparse import build_sparse_index  # noqa: E402
from easyrag_tpu.ops.bm25_resident import ResidentSparseIndex  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng)
    queries = make_queries(rng, corpus)
    big_queries = queries * 4  # 1024 queries for steady-state measurement

    t0 = time.perf_counter()
    index = build_sparse_index(corpus, bm25_type=0)
    resident = ResidentSparseIndex(index, max_query_terms=16)
    print(f"index build+upload {time.perf_counter() - t0:.1f}s "
          f"light_cap={resident.light_cap} H={resident.heavy.shape[0]}",
          flush=True)

    def per_batch(qs):
        checksum = jnp.int32(0)
        for lo in range(0, len(qs), BATCH):
            batch = qs[lo:lo + BATCH]
            ids, cnts = zip(*(resident.query_terms(q) for q in batch))
            _, ti = resident._score_topk(
                jnp.asarray(np.stack(ids)), jnp.asarray(np.stack(cnts)), TOPK
            )
            checksum = checksum + ti.sum()
        int(checksum)
        return len(qs)

    def stream(qs, b):
        _, _, checksum, q = resident.stream_score_topk_device(qs, TOPK, batch=b)
        int(checksum)
        return q

    for name, fn in [
        ("per-batch b64 q256", lambda: per_batch(queries)),
        ("stream b32 q256", lambda: stream(queries, 32)),
        ("stream b64 q256", lambda: stream(queries, 64)),
        ("stream b128 q256", lambda: stream(queries, 128)),
        ("stream b64 q1024", lambda: stream(big_queries, 64)),
        ("stream b128 q1024", lambda: stream(big_queries, 128)),
        ("stream b256 q1024", lambda: stream(big_queries, 256)),
    ]:
        fn()  # warm/compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {n / best:.0f} qps ({best * 1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
