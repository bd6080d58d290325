"""Sparse light-tail scatter-add formulations (VERDICT r2 item #4b).

The resident BM25 light tail accumulates P=(TL*C) gathered (doc, val) pairs
per query row into the [B, N] score array. The XLA scatter-add costs
~11 ns/slot, VPU-serial (TPU has no vector-scatter hardware). Candidate
formulations measured here on the bench operating shape:

1. scatter:        scores.at[b, doc].add(val)            — current
2. scatter_sorted: per-row device sort by doc id first, then scatter with
                   indices_are_sorted=True (XLA may take a cheaper path;
                   postings are per-term sorted already so the sort is
                   nearly-ordered input)
3. onehot_pallas:  existing one-hot matmul kernel (loses at sentinel-heavy
                   fill — r1 negative result, re-measured here for the
                   record at the CURRENT operating shape)
4. segsum:         flatten (b, doc) -> one segment_sum over B*N bins

Measurement: each formulation runs as a lax.scan over K independent slot
sets in ONE dispatch (the ~30 ms tunnel dispatch floor would swamp a
single [B, P] scatter); ns/slot uses K*B*P slots against (t - t_rtt).

Run: python tools/exp_scatter.py [--b 64] [--n 20000] [--tl 4] [--c 64]
     [--fill 0.3] [--k 64] [--iters 3]
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
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--tl", type=int, default=4, help="light term slots")
    ap.add_argument("--c", type=int, default=64, help="postings window")
    ap.add_argument("--fill", type=float, default=0.3,
                    help="fraction of real (non-sentinel) slots")
    ap.add_argument("--k", type=int, default=64, help="scan slices per dispatch")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B, N, K = args.b, args.n, args.k
    P = args.tl * args.c
    rng = np.random.default_rng(0)

    # gathered light-tail shape: per (term, window) mostly-sorted doc ids,
    # sentinel slots (doc=N, val=0) where the window exceeds the postings
    docs_np = np.full((K, B, P), N, np.int32)
    vals_np = np.zeros((K, B, P), np.float32)
    for kk in range(K):
        for b in range(B):
            for t in range(args.tl):
                ln = int(args.c * min(1.0, rng.exponential(args.fill)))
                d = np.sort(rng.choice(N, size=ln, replace=False)).astype(np.int32)
                docs_np[kk, b, t * args.c : t * args.c + ln] = d
                vals_np[kk, b, t * args.c : t * args.c + ln] = rng.random(ln) + 0.5
    real = (docs_np < N).mean()
    docs, vals = jnp.asarray(docs_np), jnp.asarray(vals_np)

    # dispatch floor
    @jax.jit
    def nop(d):
        return d[0, 0, 0]

    float(nop(vals))
    t_rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(nop(vals))
        t_rtt = min(t_rtt, time.perf_counter() - t0)

    def bench(name, fn):
        @jax.jit
        def run(docs, vals):
            def step(acc, dv):
                out = fn(*dv)
                return acc + out.sum(), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), (docs, vals))
            return acc

        try:
            ref = np.asarray(jax.jit(fn)(docs[0], vals[0]))
            float(run(docs, vals))
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            return None, None
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(docs, vals))
            best = min(best, time.perf_counter() - t0)
        ns_slot = (best - t_rtt) / (K * B * P) * 1e9
        print(f"{name:16s} {best*1000:8.3f} ms  {ns_slot:6.2f} ns/slot")
        return best, ref

    @jax.jit
    def scatter(docs, vals):
        z = jnp.zeros((B, N + 1), jnp.float32)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, P))
        return z.at[b_idx, docs].add(vals)[:, :N]

    @jax.jit
    def scatter_sorted(docs, vals):
        d, v = jax.lax.sort((docs, vals), dimension=-1, num_keys=1)
        z = jnp.zeros((B, N + 1), jnp.float32)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, P))
        return z.at[b_idx, d].add(
            v, indices_are_sorted=True, mode="drop"
        )[:, :N]

    @jax.jit
    def segsum(docs, vals):
        # one flat segment-sum over B*(N+1) bins
        flat = (jnp.arange(B, dtype=jnp.int32)[:, None] * (N + 1) + docs).ravel()
        out = jax.ops.segment_sum(vals.ravel(), flat, num_segments=B * (N + 1),
                                  indices_are_sorted=False)
        return out.reshape(B, N + 1)[:, :N]

    def onehot_pallas(docs, vals):
        from easyrag_tpu.ops.bm25_pallas import bm25_scores_pallas

        return bm25_scores_pallas(docs, vals, num_docs=N, interpret=args.cpu)

    @jax.jit
    def scatter_flat(docs, vals):
        # segsum's win without its extra buffer: flatten the batch dim into
        # the scatter index and update the RAVELED scores alias; sentinel
        # rows route to the OOB index B*N and drop
        z = jnp.zeros((B, N), jnp.float32)
        b_off = (jnp.arange(B, dtype=jnp.int32)[:, None] * N)
        flat_idx = jnp.where(docs < N, b_off + docs, B * N)
        return (
            z.reshape(B * N)
            .at[flat_idx.reshape(-1)]
            .add(vals.reshape(-1), mode="drop")
            .reshape(B, N)
        )

    print(f"B={B} P={P} N={N} K={K} real-slot fill {real*100:.0f}%; "
          f"rtt {t_rtt*1000:.1f} ms")
    t1, ref = bench("scatter", scatter)
    _, r2 = bench("scatter_sorted", scatter_sorted)
    _, r3 = bench("segsum", segsum)
    _, r4 = bench("onehot_pallas", onehot_pallas)
    _, r5 = bench("scatter_flat", scatter_flat)
    for name, r in (("scatter_sorted", r2), ("segsum", r3),
                    ("onehot_pallas", r4), ("scatter_flat", r5)):
        if r is not None:
            ok = np.allclose(r, ref, atol=1e-4)
            if not ok:
                print(f"  !! {name} mismatch: max |d| {np.abs(r-ref).max():.2e}")


if __name__ == "__main__":
    main()
