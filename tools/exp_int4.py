"""Probe: int4 weight-only matmul forms on the TPU backend.

Decode is weight-bandwidth-bound (BASELINE.md: 10.8 ms/step int8 = the
whole 7.1 GiB tree at 657 GB/s), so int4 weights are worth up to ~2x
tok/s IF the s4 -> bf16 dequant fuses into the matmul's operand load
instead of materializing a bf16 copy. Forms, one per invocation
(`python tools/exp_int4.py bf16|int8|int4|int4pack [T]`) so a
pathological compile can't eat the others' budget:

  bf16       x @ w.T                                  (2 bytes/weight)
  int8       (x @ w_q.T.astype(bf16)) * scale         (1 byte/weight)
  int4       (x @ w4.T.astype(bf16)) * scale          (jnp.int4 storage —
             r4 finding: S4 arrays RecursionError in device_put / hang
             the compile on the axon backend; kept for re-probing)
  int4pack   nibbles packed in int8, shift/mask unpack (backend-proof;
             the question is whether the unpack fuses or materializes)

Each form loops T in-jit passes over R distinct weight copies (reads can't
cache; the ~30 ms tunnel RTT amortizes over T*R matmuls). Effective GB/s
per form tells whether the storage is really half-width.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

O, I, R = 18944, 3584, 8


def bench(fn, x, reps, iters=3):
    t0 = time.perf_counter()
    fn(x).block_until_ready()  # compile
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best / reps  # seconds per single matvec


def main():
    form = sys.argv[1] if len(sys.argv) > 1 else "int8"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    print(f"backend={jax.default_backend()} form={form} T={T}", flush=True)
    key = jax.random.key(0)

    @jax.jit
    def make():
        w = jax.random.normal(key, (R, O, I), jnp.bfloat16) * 0.02
        wf = w.astype(jnp.float32)
        s8 = jnp.max(jnp.abs(wf), axis=2) / 127.0
        w8 = jnp.clip(jnp.rint(wf / s8[:, :, None]), -127, 127).astype(jnp.int8)
        s4 = jnp.max(jnp.abs(wf), axis=2) / 7.0
        w4i = jnp.clip(jnp.rint(wf / s4[:, :, None]), -7, 7).astype(jnp.int8)
        lo = w4i[:, :, 0::2] & 0xF
        hi = (w4i[:, :, 1::2] & 0xF) << 4
        wp = (lo | hi).astype(jnp.int8)
        x = jax.random.normal(jax.random.fold_in(key, 1), (1, I), jnp.bfloat16)
        return w, w8, s8, w4i, s4, wp, x

    w, w8, s8, w4i, s4, wp, x = make()
    print("weights made", flush=True)

    def looped(step):
        def fn(x):
            def body(t, acc):
                for r in range(R):
                    acc = acc + step(x, r).astype(jnp.float32)
                return acc
            acc = jax.lax.fori_loop(0, T, body, jnp.zeros((1, O), jnp.float32))
            return acc.sum()
        return jax.jit(fn)

    gb = O * I / 2**30
    bytes_per = {"bf16": 2, "int8": 1, "int4": 0.5, "int4pack": 0.5}[form]

    if form == "bf16":
        t = bench(looped(lambda x, r: x @ w[r].T), x, R * T)
    elif form == "int8":
        t = bench(looped(
            lambda x, r: (x @ w8[r].T.astype(x.dtype)) * s8[r].astype(x.dtype)
        ), x, R * T)
    elif form == "int4":
        w4 = jax.jit(lambda a: a.astype(jnp.int4))(w4i)
        w4.block_until_ready()
        print("int4 array created", flush=True)
        t = bench(looped(
            lambda x, r: (x @ w4[r].T.astype(x.dtype)) * s4[r].astype(x.dtype)
        ), x, R * T)
    elif form == "int4pack":
        def step(x, r):
            lo = ((wp[r] << 4).astype(jnp.int8) >> 4)  # sign-extend low
            hi = wp[r] >> 4  # arithmetic shift sign-extends the high nibble
            w_r = jnp.stack([lo, hi], axis=-1).reshape(O, I)
            return (x @ w_r.T.astype(x.dtype)) * s4[r].astype(x.dtype)
        t = bench(looped(step), x, R * T)
    print(f"{form}: {t*1e3:.3f} ms/matvec  ({gb*bytes_per/t:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
