"""Dense-stream matmul roofline probe.

exp_dense_sel measured the stream's matmul at ~2.14 ms per 256-query slice
(20k x 3584 bf16). Roofline says ~0.19 ms compute (36.7 GFLOP @ 197 TFLOPs)
and ~0.16 ms matrix read (143 MB @ 899 GB/s) — the measured number is ~10x
off, so the scan composition (or the matrix layout) is leaving most of the
chip idle. Variants:

  a. scan B=256 (current stream shape)
  b. scan B=512 / B=1024 (fewer matrix re-reads)
  c. ONE matmul over all 4096 queries (no scan)
  d. pre-transposed matrix [D, N] (contraction layout)
  e. N padded to a 128 multiple (20480)
  f. winner + full pruned top-k (does the win survive selection?)

Run: python tools/exp_dense_mm.py [--iters 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--nq", type=int, default=4096)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from easyrag_tpu.ops.topk import topk_desc_reference_order

    N, D, K, NQ = args.n, 3584, 288, args.nq
    key = jax.random.key(7)
    matrix = jax.random.normal(key, (N, D), jnp.bfloat16)
    matrix_t = jnp.asarray(np.asarray(matrix).T)  # [D, N] materialized
    n_pad = ((N + 127) // 128) * 128
    matrix_pad = jnp.concatenate(
        [matrix, jnp.zeros((n_pad - N, D), jnp.bfloat16)], axis=0
    )
    qall = jax.random.normal(jax.random.fold_in(key, 1), (NQ, D), jnp.bfloat16)

    flops = 2.0 * NQ * N * D

    def bench(name, fn, *a):
        try:
            float(fn(*a))
        except Exception as e:
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:140]}")
            return None
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(*a))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:26s} {best*1000:8.2f} ms  {flops/best/1e12:6.1f} TFLOPs  "
              f"({NQ/best:8.0f} q/s)")
        return best

    def scanned(B, mat, trans=False):
        B = min(B, NQ)
        q = qall.reshape(NQ // B, B, D)

        @jax.jit
        def run(q, mat):
            def step(acc, x):
                if trans:
                    s = jax.lax.dot_general(
                        x, mat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    s = jax.lax.dot_general(
                        x, mat, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return acc + s.sum(), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), q)
            return acc

        return lambda: run(q, mat)

    @jax.jit
    def one_shot(q, mat):
        s = jax.lax.dot_general(q, mat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s.sum()

    @jax.jit
    def one_shot_t(q, mat):
        s = jax.lax.dot_general(q, mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s.sum()

    print(f"NQ={NQ} N={N} D={D}; peak ~197 TFLOPs bf16 v5e")
    bench("a scan B=256 [N,D]", scanned(256, matrix))
    bench("b scan B=512 [N,D]", scanned(512, matrix))
    bench("b scan B=1024 [N,D]", scanned(1024, matrix))
    bench("c one-shot 4096 [N,D]", lambda: one_shot(qall, matrix))
    bench("d scan B=256 [D,N]^T", scanned(256, matrix_t, trans=True))
    bench("d one-shot 4096 [D,N]^T", lambda: one_shot_t(qall, matrix_t))
    bench("e one-shot N->20480 pad", lambda: one_shot(qall, matrix_pad))

    # winner + full selection at a big batch
    def full(B, mat):
        B = min(B, NQ)
        q = qall.reshape(NQ // B, B, D)

        @jax.jit
        def run(q, mat):
            def step(acc, x):
                s = jax.lax.dot_general(x, mat, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                tv, ti = topk_desc_reference_order(s, K)
                return acc + ti.sum().astype(jnp.float32) + tv.sum(), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), q)
            return acc

        return lambda: run(q, mat)

    bench("f full topk scan B=256", full(256, matrix))
    bench("f full topk scan B=1024", full(1024, matrix))
    bench("f full topk scan B=2048", full(2048, matrix))


if __name__ == "__main__":
    main()
