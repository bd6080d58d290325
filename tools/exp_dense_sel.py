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

    def f_sorted_chunks(x):
        # exact alternative to the two-key candidate sort: order the
        # SELECTED CHUNKS ascending by index (288-int sort, tiny), gather in
        # that order -> candidate position is monotone in global index ->
        # the flip+top_k trick applies (ties -> lowest flipped position =
        # highest global index), no 2304-wide two-key sort
        s = matmul(x)
        sc = s.reshape(B, NC, CH)
        cmax = sc.max(-1)
        _, rev = jax.lax.top_k(jnp.flip(cmax, -1), K)
        ci = jnp.sort((NC - 1) - rev, axis=-1)  # ascending chunk index
        gathered = jnp.take_along_axis(sc, ci[..., None], axis=-2)
        flat = gathered.reshape(B, K * CH)
        gidx = ((ci * CH)[..., None] + jnp.arange(CH, dtype=jnp.int32)).reshape(B, K * CH)
        vals, rpos = jax.lax.top_k(jnp.flip(flat, -1), K)
        pos = (K * CH - 1) - rpos
        ti = jnp.take_along_axis(gidx, pos, axis=-1)
        return ti.sum().astype(jnp.float32) + vals.sum()

    t_a = bench("a matmul only", a_matmul)
    t_b = bench("b +chunkmax", b_chunkmax)
    t_c = bench("c +chunk topk", c_chunksel)
    t_e = bench("e +gatherless prune", e_nogather)
    t_d = bench("d full pruned topk (prod)", d_full)
    t_f = bench("f sorted-chunks flip+topk", f_sorted_chunks)
    print(f"\nmarginals per 4096q: chunkmax {1000*(t_b-t_a):.1f} ms, "
          f"chunk-topk {1000*(t_c-t_b):.1f} ms, "
          f"gather+sort {1000*(t_d-t_e):.1f} ms, total sel {1000*(t_d-t_a):.1f} ms; "
          f"f-variant total sel {1000*(t_f-t_a):.1f} ms")

    # exactness of f vs the production path on one batch
    from easyrag_tpu.ops.topk import _chunkmax_pruned_topk

    x0 = q[0]
    s0 = jax.jit(matmul)(x0)
    tv_ref, ti_ref = jax.jit(lambda s: _chunkmax_pruned_topk(s, K))(s0)

    @jax.jit
    def f_vals(s):
        sc = s.reshape(B, NC, CH)
        cmax = sc.max(-1)
        _, rev = jax.lax.top_k(jnp.flip(cmax, -1), K)
        ci = jnp.sort((NC - 1) - rev, axis=-1)
        gathered = jnp.take_along_axis(sc, ci[..., None], axis=-2)
        flat = gathered.reshape(B, K * CH)
        gidx = ((ci * CH)[..., None] + jnp.arange(CH, dtype=jnp.int32)).reshape(B, K * CH)
        vals, rpos = jax.lax.top_k(jnp.flip(flat, -1), K)
        pos = (K * CH - 1) - rpos
        return vals, jnp.take_along_axis(gidx, pos, axis=-1)

    tv_f, ti_f = f_vals(s0)
    print("f exact (vals):", bool(np.array_equal(np.asarray(tv_f), np.asarray(tv_ref))),
          " (idx):", bool(np.array_equal(np.asarray(ti_f), np.asarray(ti_ref))))


if __name__ == "__main__":
    main()
