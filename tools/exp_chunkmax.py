"""Chunk-max reduce formulations — attacking the dense/sparse stream's
remaining selection floor (ROADMAP: XLA runs the minor-8 max at ~11 GB/s vs
the measured 899 GB/s HBM roofline; Mosaic rejected (NC, 8) tilings in r2).

Formulations (each computes a per-8-element-group max over [B, N] f32):

1. minor8:   x.reshape(B, NC, 8).max(-1)           — the current form
2. sublane:  x.reshape(B, G, 8, 128).max(-2)       — groups = 8 sublanes at
             one lane (DIFFERENT chunk semantics; needs a two-key chunk
             select for exact ties — also measured below)
3. transpose: swap the 8 into sublanes explicitly then reduce
4. pallas_roll: in-kernel lane-shift tree max (pltpu.roll by 1/2/4) +
             one-hot matmul compaction to [R, 16] — contiguous chunks,
             drop-in semantics
5. pallas_sublane: form 2 inside one kernel

Measurement: the tunnel dispatch floor is ~30 ms, so each formulation runs
as a lax.scan over K independent [B, N] slices in ONE dispatch with a
checksum readback; effective GB/s = K*B*N*4 / (t - t_rtt).

Run: python tools/exp_chunkmax.py [--b 256] [--n 20480] [--k 128] [--iters 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CH = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--n", type=int, default=20480)
    ap.add_argument("--k", type=int, default=128, help="scan slices per dispatch")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, K = args.b, args.n, args.k
    NC = N // CH
    R = N // 128
    G = R // 8
    bytes_read = K * B * N * 4

    X = jax.random.normal(jax.random.key(0), (K, B, N), jnp.float32)

    # dispatch floor: an empty-ish jit with a scalar readback
    @jax.jit
    def nop(x):
        return x[0, 0, 0]

    float(nop(X))
    t_rtt = min(
        (lambda t0: (float(nop(X)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )

    def scan_form(fn):
        @jax.jit
        def run(X):
            def step(acc, x):
                m = fn(x)
                # FULL output sum: a strided checksum would let XLA dead-code
                # most of the reduce; the extra output pass (N/8 elements,
                # ~12%) is identical across formulations
                return acc + m.sum(), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), X)
            return acc

        return run

    def bench(name, fn):
        run = scan_form(fn)
        try:
            chk = float(run(X))
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:180]}")
            return None
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(X))
            best = min(best, time.perf_counter() - t0)
        eff = bytes_read / max(best - t_rtt, 1e-9) / 1e9
        print(f"{name:18s} {best*1000:8.2f} ms   {eff:7.1f} GB/s  (chk {chk:.1f})")
        return best

    # -- formulations ------------------------------------------------------
    def minor8(x):
        return x.reshape(B, NC, CH).max(-1)

    def sublane(x):
        return x.reshape(B, G, 8, 128).max(-2)

    def transpose_form(x):
        return x.reshape(B, NC, CH).swapaxes(-1, -2).max(-2)

    SEL = np.zeros((128, 16), np.float32)
    for c in range(16):
        SEL[8 * c, c] = 1.0
    SELj = jnp.asarray(SEL)

    def roll_kernel(x_ref, sel_ref, o_ref):
        v = x_ref[:]
        # out[l] must see in[l+d]: roll by 128-d (non-negative shifts only)
        m = jnp.maximum(v, pltpu.roll(v, shift=127, axis=1))
        m = jnp.maximum(m, pltpu.roll(m, shift=126, axis=1))
        m = jnp.maximum(m, pltpu.roll(m, shift=124, axis=1))
        o_ref[:] = jax.lax.dot_general(
            m, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    BR = min(512, B * R)

    def pallas_roll(x):
        rows = x.reshape(B * R, 128)
        return pl.pallas_call(
            roll_kernel,
            out_shape=jax.ShapeDtypeStruct((B * R, 16), jnp.float32),
            grid=(B * R // BR,),
            in_specs=[
                pl.BlockSpec((BR, 128), lambda i: (i, 0)),
                pl.BlockSpec((128, 16), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BR, 16), lambda i: (i, 0)),
            interpret=args.cpu,
        )(rows, SELj).reshape(B, NC)

    def sub_kernel(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = v.reshape(v.shape[0] // 8, 8, 128).max(axis=1)

    BG = min(64, B * G)

    def pallas_sublane(x):
        rows = x.reshape(B * R, 128)
        return pl.pallas_call(
            sub_kernel,
            out_shape=jax.ShapeDtypeStruct((B * G, 128), jnp.float32),
            grid=(B * R // (BG * 8),),
            in_specs=[pl.BlockSpec((BG * 8, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((BG, 128), lambda i: (i, 0)),
            interpret=args.cpu,
        )(rows)

    print(f"B={B} N={N} K={K} -> {bytes_read/2**20:.0f} MiB/dispatch; "
          f"rtt {t_rtt*1000:.1f} ms; roofline ~899 GB/s")
    bench("minor8 (current)", minor8)
    bench("sublane", sublane)
    bench("transpose", transpose_form)
    bench("pallas_roll", pallas_roll)
    bench("pallas_sublane", pallas_sublane)

    # correctness vs oracle (single slice)
    x0 = X[0]
    ref = np.asarray(jax.jit(minor8)(x0))
    for name, fn, reshape in (
        ("pallas_roll", pallas_roll, None),
        ("pallas_sublane", pallas_sublane, "sub"),
    ):
        try:
            got = np.asarray(jax.jit(fn)(x0))
        except Exception:
            continue
        if reshape == "sub":
            ref2 = np.asarray(jax.jit(sublane)(x0)).reshape(B * G, 128)
            print(f"{name} exact vs sublane-form:", bool(np.array_equal(got, ref2)))
        else:
            print(f"{name} exact vs minor8:", bool(np.array_equal(got, ref)))

    # -- chunk-selection stage: one-key flip+topk vs the two-key sort the
    # sublane layout needs for exact ties ---------------------------------
    TK = min(288, NC)

    def sel_topk(x):
        cmax = minor8(x)
        _, rev = jax.lax.top_k(jnp.flip(cmax, -1), TK)
        return rev.astype(jnp.float32)

    def sel_sort2(x):
        cmax = minor8(x)
        carg = jnp.argmax(x.reshape(B, NC, CH), axis=-1).astype(jnp.int32)
        nv, ni = jax.lax.sort((-cmax, -carg), dimension=-1, num_keys=2)
        return ni[..., :TK].astype(jnp.float32)

    bench("sel flip+topk", sel_topk)
    bench("sel 2key-sort", sel_sort2)


if __name__ == "__main__":
    main()
