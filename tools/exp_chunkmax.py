"""Chunk-max reduce formulations — attacking the dense/sparse stream's
remaining selection floor (ROADMAP: XLA runs the minor-8 max at ~11 GB/s vs
the measured 899 GB/s HBM roofline; Mosaic rejected (NC, 8) tilings in r2).

Formulations measured (all compute a per-8-element-group max over a
[B, N] f32 score array):

1. minor8:   x.reshape(B, NC, 8).max(-1)           — the current form
2. sublane:  x.reshape(B, G, 8, 128).max(-2)       — groups = 8 sublanes at
             one lane (DIFFERENT chunk semantics; needs a two-key chunk
             select to stay exact — measured separately below)
3. transpose: swap the 8 into sublanes explicitly then reduce
4. pallas_roll: in-kernel lane-shift tree max (pltpu.roll by 1/2/4) +
             one-hot matmul compaction to [R, 16] — contiguous chunks,
             drop-in semantics
5. pallas_sublane: form 2 inside one kernel (HBM->VMEM once)

Also measures the two-key (max, argmax) chunk-selection sort that form 2
needs for exact ties, so the integration decision is numbers-backed.

Run: python tools/exp_chunkmax.py [--b 256] [--n 20480] [--iters 5]
"""

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = args.b, args.n
    NC = N // CH
    R = N // 128  # f32 rows of 128 lanes per score row
    G = R // 8
    bytes_read = B * N * 4

    x = jax.random.normal(jax.random.key(0), (B, N), jnp.float32)

    def bench(name, fn, *a):
        try:
            out = fn(*a)
            jax.block_until_ready(out)
            chk = float(jnp.asarray(out[0] if isinstance(out, tuple) else out).sum())
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            # chained checksum readback (block_until_ready does not sync on
            # this attachment)
            s = out[0] if isinstance(out, tuple) else out
            float(s.ravel()[:1].sum())
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name:18s} {best*1000:7.2f} ms   {bytes_read/best/1e9:7.1f} GB/s  "
            f"(chk {chk:.1f})"
        )
        return best

    # -- 1. current minor-8 reduce -----------------------------------------
    @jax.jit
    def minor8(x):
        return x.reshape(B, NC, CH).max(-1)

    # -- 2. sublane-group reduce (different chunk semantics) ---------------
    @jax.jit
    def sublane(x):
        return x.reshape(B, G, 8, 128).max(-2)

    # -- 3. explicit transpose then sublane reduce (same chunks as 1) ------
    @jax.jit
    def transpose_form(x):
        t = x.reshape(B, NC, CH).swapaxes(-1, -2)  # [B, 8, NC]
        return t.max(-2)

    # -- 4. pallas roll-tree kernel (contiguous chunks, compacted [*,16]) --
    SEL = np.zeros((128, 16), np.float32)
    for c in range(16):
        SEL[8 * c, c] = 1.0

    def roll_kernel(x_ref, sel_ref, o_ref):
        v = x_ref[:]  # [BR, 128]
        m = jnp.maximum(v, pltpu.roll(v, shift=-1, axis=1))
        m = jnp.maximum(m, pltpu.roll(m, shift=-2, axis=1))
        m = jnp.maximum(m, pltpu.roll(m, shift=-4, axis=1))
        # lanes 0, 8, ..., 120 hold their chunk's max; compact via one-hot
        # matmul (exact: each output sums exactly one element)
        o_ref[:] = jax.lax.dot_general(
            m, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    BR = 512  # rows per program: 512*128*4 = 256 KB VMEM in

    @jax.jit
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
            interpret=args.interpret,
        )(rows, jnp.asarray(SEL)).reshape(B, NC)

    # -- 5. pallas sublane kernel (form-2 chunks in one pass) --------------
    def sub_kernel(x_ref, o_ref):
        v = x_ref[:]  # [BG*8, 128]
        v4 = v.reshape(v.shape[0] // 8, 8, 128)
        o_ref[:] = v4.max(axis=1)

    BG = 64  # chunk-groups per program: 64*8*128*4 = 256 KB in

    @jax.jit
    def pallas_sublane(x):
        rows = x.reshape(B * R, 128)
        return pl.pallas_call(
            sub_kernel,
            out_shape=jax.ShapeDtypeStruct((B * G, 128), jnp.float32),
            grid=(B * R // (BG * 8),),
            in_specs=[pl.BlockSpec((BG * 8, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((BG, 128), lambda i: (i, 0)),
            interpret=args.interpret,
        )(rows)

    print(f"B={B} N={N} -> {bytes_read/2**20:.0f} MiB read; roofline ~899 GB/s")
    t1 = bench("minor8 (current)", minor8, x)
    bench("sublane", sublane, x)
    bench("transpose", transpose_form, x)
    t4 = bench("pallas_roll", pallas_roll, x)
    t5 = bench("pallas_sublane", pallas_sublane, x)

    # correctness vs oracle
    ref = np.asarray(minor8(x))
    if t4 is not None:
        got = np.asarray(pallas_roll(x))
        print("pallas_roll exact:", bool(np.array_equal(got, ref)))
    if t5 is not None:
        got = np.asarray(pallas_sublane(x))
        ref2 = np.asarray(sublane(x)).reshape(B * G, 128)
        print("pallas_sublane exact vs sublane-form:", bool(np.array_equal(got, ref2)))

    # -- the two-key chunk-selection sort form 2 would need ----------------
    K = 288

    @jax.jit
    def select_topk(cmax):  # current: flip + top_k (one key)
        _, rev = jax.lax.top_k(jnp.flip(cmax, -1), K)
        return rev

    @jax.jit
    def select_sort2(cmax, cargmax):  # two keys: (max desc, argmax idx desc)
        nv, ni = jax.lax.sort((-cmax, -cargmax), dimension=-1, num_keys=2)
        return ni[..., :K]

    cmax = minor8(x)
    cargmax = jnp.argmax(x.reshape(B, NC, CH), axis=-1).astype(jnp.int32)
    bench("select flip+topk", select_topk, cmax)
    bench("select 2key-sort", select_sort2, cmax, cargmax)


if __name__ == "__main__":
    main()
