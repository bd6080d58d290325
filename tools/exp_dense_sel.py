"""Dense-stream selection decomposition (follow-up to exp_chunkmax).

exp_chunkmax found the standalone chunk-max reduce runs at 242-286 GB/s —
not the ~11 GB/s ROADMAP attributed to it from IN-STREAM marginals. So the
floor is in the composition: this probe times the REAL
``dense_score_topk_stream`` against ablations on the bench shape
(20k x 3584 bf16 matrix, 4096 queries in 256-query batches):

  a. matmul only
  b. matmul + chunk-max reduce (no top-k)
  c. matmul + chunk-max + chunk top-k selection (no gather/sort)
  d. full pruned top-k (current production path)
  e. full with the candidate gather replaced by a dummy (isolates gather)

Run: python tools/exp_dense_sel.py [--iters 3]
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
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--nq", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from easyrag_tpu.ops.topk import _PRUNE_CH, topk_desc_reference_order

    N, D, K, B = 20_000, 3584, 288, args.b
    NB = args.nq // B
    key = jax.random.key(7)
    matrix = jax.random.normal(key, (N, D), jnp.bfloat16)
    q = jax.random.normal(jax.random.fold_in(key, 1), (NB, B, D), jnp.bfloat16)

    CH = _PRUNE_CH
    NC = N // CH

    def matmul(x):
        return jax.lax.dot_general(
            x, matrix, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def scan(fn):
        @jax.jit
        def run(q):
            def step(acc, x):
                return acc + fn(x), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), q)
            return acc

        return run

    def bench(name, fn):
        run = scan(fn)
        float(run(q))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(q))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best*1000:8.2f} ms  ({args.nq/best:8.0f} qps)")
        return best

    def a_matmul(x):
        return matmul(x).sum()

    def b_chunkmax(x):
        s = matmul(x)
        return s.reshape(B, NC, CH).max(-1).sum()

    def c_chunksel(x):
        s = matmul(x)
        cmax = s.reshape(B, NC, CH).max(-1)
        _, rev = jax.lax.top_k(jnp.flip(cmax, -1), K)
        return rev.sum().astype(jnp.float32)

    def d_full(x):
        s = matmul(x)
        tv, ti = topk_desc_reference_order(s, K)
        return ti.sum().astype(jnp.float32) + tv.sum()

    def e_nogather(x):
        s = matmul(x)
        sc = s.reshape(B, NC, CH)
        cmax = sc.max(-1)
        _, rev = jax.lax.top_k(jnp.flip(cmax, -1), K)
        ci = (NC - 1) - rev
        # skip the take_along_axis gather + final sort; consume ci + cmax
        return ci.sum().astype(jnp.float32) + cmax.sum()

    t_a = bench("a matmul only", a_matmul)
    t_b = bench("b +chunkmax", b_chunkmax)
    t_c = bench("c +chunk topk", c_chunksel)
    t_e = bench("e +gatherless prune", e_nogather)
    t_d = bench("d full pruned topk (prod)", d_full)
    print(f"\nmarginals per 4096q: chunkmax {1000*(t_b-t_a):.1f} ms, "
          f"chunk-topk {1000*(t_c-t_b):.1f} ms, "
          f"gather+sort {1000*(t_d-t_e):.1f} ms, total sel {1000*(t_d-t_a):.1f} ms")


if __name__ == "__main__":
    main()
