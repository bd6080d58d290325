"""Sparse heavy-part formulations (r3 follow-up to the stream decomposition).

The resident index scores heavy terms as ``A[B,H] @ heavy[H,N]`` on the MXU
(``ops/bm25_resident.py``). A is one-hot-with-counts with only T<=16
nonzeros per row, so the matmul does H/T (~wasted 100-200x) FLOPs; at f32
HIGHEST precision it measured ~94 ms per 4096-query stream in r2 — ~3x its
own roofline. Alternatives that read only the T needed rows:

  a. matmul (current): one-hot [B,H] @ heavy [H,N], f32 HIGHEST
  b. gather+einsum:    heavy[rows[b,t]] -> [B,T,N], einsum bt,btn->bn
  c. gather+fori:      accumulate T gathered rows (avoids the [B,T,N]
                       materialization explicitly)
  d. matmul bf16 heavy (r2's compressed option, for scale)

Exactness: b/c accumulate the same f32 products in a different order than
the matmul; the host float64-oracle parity tolerance (f32 rounding) is the
contract, checked here against a.

Run: python tools/exp_sparse_heavy.py [--b 64] [--h 3072] [--n 20000]
     [--t 16] [--k 64] [--iters 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--h", type=int, default=3072)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--k", type=int, default=64, help="scan slices per dispatch")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B, H, N, T, K = args.b, args.h, args.n, args.t, args.k
    rng = np.random.default_rng(0)
    heavy_np = (rng.random((H, N), np.float32) * (rng.random((H, N)) < 0.05)).astype(np.float32)
    heavy = jnp.asarray(heavy_np)
    heavy_bf = heavy.astype(jnp.bfloat16)
    # per-query heavy rows (some -1 = unused slot) + counts
    rows_np = rng.integers(0, H, size=(K, B, T)).astype(np.int32)
    rows_np[rng.random((K, B, T)) < 0.3] = -1
    cnts_np = rng.integers(1, 4, size=(K, B, T)).astype(np.float32)
    rows, cnts = jnp.asarray(rows_np), jnp.asarray(cnts_np)

    @jax.jit
    def nop(d):
        return d[0, 0, 0]

    float(nop(cnts))
    t_rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(nop(cnts))
        t_rtt = min(t_rtt, time.perf_counter() - t0)

    def bench(name, fn):
        @jax.jit
        def run(rows, cnts):
            def step(acc, rc):
                out = fn(*rc)
                return acc + out.sum(), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), (rows, cnts))
            return acc

        try:
            ref = np.asarray(jax.jit(fn)(rows[0], cnts[0]))
            float(run(rows, cnts))
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:150]}")
            return None, None
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(rows, cnts))
            best = min(best, time.perf_counter() - t0)
        dev = (best - t_rtt) * 1000
        print(f"{name:18s} {best*1000:8.2f} ms total  {dev:8.2f} ms device "
              f"({K*B/(best):8.0f} q/s)")
        return best, ref

    def a_matmul(r, c):
        rr = jnp.where(r >= 0, r, H)
        A = jnp.zeros((B, H), jnp.float32)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        A = A.at[b_idx, rr].add(jnp.where(r >= 0, c, 0.0), mode="drop")
        return jax.lax.dot_general(
            A, heavy, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def b_gather_einsum(r, c):
        rr = jnp.where(r >= 0, r, 0)
        w = jnp.where(r >= 0, c, 0.0)
        g = heavy[rr]  # [B, T, N]
        return jnp.einsum("bt,btn->bn", w, g)

    def c_gather_fori(r, c):
        rr = jnp.where(r >= 0, r, 0)
        w = jnp.where(r >= 0, c, 0.0)

        def body(t, acc):
            return acc + w[:, t][:, None] * heavy[rr[:, t]]

        return jax.lax.fori_loop(0, T, body, jnp.zeros((B, N), jnp.float32))

    def d_matmul_bf16(r, c):
        rr = jnp.where(r >= 0, r, H)
        A = jnp.zeros((B, H), jnp.float32)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        A = A.at[b_idx, rr].add(jnp.where(r >= 0, c, 0.0), mode="drop")
        return jax.lax.dot_general(
            A.astype(jnp.bfloat16), heavy_bf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    print(f"B={B} H={H} N={N} T={T} K={K}; rtt {t_rtt*1000:.1f} ms; "
          f"roofline read {K*B*T*0.7*N*4/2**30:.1f} GiB (gather) vs "
          f"{K*H*N*4/2**30:.1f} GiB (matmul re-read/slice x{K})")
    _, ref = bench("a matmul f32-high", a_matmul)
    _, rb = bench("b gather+einsum", b_gather_einsum)
    _, rc = bench("c gather+fori", c_gather_fori)
    _, rd = bench("d matmul bf16", d_matmul_bf16)
    for name, r in (("gather+einsum", rb), ("gather+fori", rc)):
        if r is not None and ref is not None:
            ok = np.allclose(r, ref, rtol=1e-5, atol=1e-5)
            print(f"{name} parity (f32 tolerance): {ok}"
                  + ("" if ok else f"  max|d|={np.abs(r-ref).max():.2e}"))


if __name__ == "__main__":
    main()
