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
        # SEPARATE per-copy arrays (a list pytree), matching the model's
        # real per-param layout — slices of one [R, O, I] array measured
        # with inherited layouts that do not represent production matmuls
        w, w8, s8, w4i, s4, wp = [], [], [], [], [], []
        for r in range(R):
            wr = jax.random.normal(
                jax.random.fold_in(key, r), (O, I), jnp.bfloat16
            ) * 0.02
            wf = wr.astype(jnp.float32)
            s8r = jnp.max(jnp.abs(wf), axis=1) / 127.0
            w8r = jnp.clip(jnp.rint(wf / s8r[:, None]), -127, 127).astype(jnp.int8)
            s4r = jnp.max(jnp.abs(wf), axis=1) / 7.0
            w4r = jnp.clip(jnp.rint(wf / s4r[:, None]), -7, 7).astype(jnp.int8)
            lo = w4r[:, 0::2] & 0xF
            hi = (w4r[:, 1::2] & 0xF) << 4
            w.append(wr); w8.append(w8r); s8.append(s8r)
            w4i.append(w4r); s4.append(s4r); wp.append((lo | hi).astype(jnp.int8))
        x = jax.random.normal(jax.random.fold_in(key, 99), (1, I), jnp.bfloat16)
        return w, w8, s8, w4i, s4, wp, x

    w, w8, s8, w4i, s4, wp, x = make()
    print("weights made", flush=True)

    def looped(step):
        # weights ride as EXPLICIT jit args: closure-captured device arrays
        # measured pathological on the axon backend (compile never returns
        # at 1 GB constants — presumably re-shipped through the tunnel)
        @jax.jit
        def fn(x, *ws):
            def body(t, acc):
                for r in range(R):
                    acc = acc + step(x, r, *ws).astype(jnp.float32)
                return acc
            acc = jax.lax.fori_loop(0, T, body, jnp.zeros((1, O), jnp.float32))
            return acc.sum()
        return fn

    def bench_args(fn, *args, reps, iters=3):
        import time as _t
        t0 = _t.perf_counter()
        fn(*args).block_until_ready()
        print(f"  compile+first: {_t.perf_counter()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(iters):
            t0 = _t.perf_counter()
            float(fn(*args))
            best = min(best, _t.perf_counter() - t0)
        return best / reps

    gb = O * I / 2**30
    bytes_per = {"bf16": 2, "int8": 1, "w8a8": 1, "int4": 0.5, "int4pack": 0.5, "w4a8": 0.5}[form]

    if form == "bf16":
        t = bench_args(looped(lambda x, r, w: x @ w[r].T), x, w, reps=R * T)
    elif form == "int8":
        t = bench_args(looped(
            lambda x, r, w8, s8:
            (x @ w8[r].T.astype(x.dtype)) * s8[r].astype(x.dtype)
        ), x, w8, s8, reps=R * T)
    elif form == "w8a8":
        # production act_quant form (layers._linear): per-token x quant,
        # s8 x s8 -> s32, rank-1 rescale — the MXU reads weights RAW
        bytes_per = 1
        def step(x, r, w8, s8):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.where(amax > 0, amax, 1.0) / 127.0
            x_q = jnp.round(xf / xs).astype(jnp.int8)
            y = jax.lax.dot_general(
                x_q, w8[r], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * xs * s8[r]).astype(x.dtype)
        t = bench_args(looped(step), x, w8, s8, reps=R * T)
    elif form == "int4":
        w4 = jax.jit(lambda a: [r.astype(jnp.int4) for r in a])(w4i)
        jax.block_until_ready(w4)
        print("int4 array created", flush=True)
        t = bench_args(looped(
            lambda x, r, w4, s4:
            (x @ w4[r].T.astype(x.dtype)) * s4[r].astype(x.dtype)
        ), x, w4, s4, reps=R * T)
    elif form == "int4pack":
        def step(x, r, wp, s4):
            lo = ((wp[r] << 4).astype(jnp.int8) >> 4)  # sign-extend low
            hi = wp[r] >> 4  # arithmetic shift sign-extends the high nibble
            w_r = jnp.stack([lo, hi], axis=-1).reshape(O, I)
            return (x @ w_r.T.astype(x.dtype)) * s4[r].astype(x.dtype)
        t = bench_args(looped(step), x, wp, s4, reps=R * T)
    elif form == "w4a8":
        # s4-as-s8 weights fed RAW to the s8 MXU after nibble unpack in
        # integer domain (shift/mask stays on s8 vectors, no f32 convert)
        bytes_per = 0.5
        def step(x, r, wp, s4):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.where(amax > 0, amax, 1.0) / 127.0
            x_q = jnp.round(xf / xs).astype(jnp.int8)
            lo = ((wp[r] << 4).astype(jnp.int8) >> 4)
            hi = wp[r] >> 4
            w_r = jnp.stack([lo, hi], axis=-1).reshape(O, I)
            y = jax.lax.dot_general(
                x_q, w_r, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * xs * s4[r]).astype(x.dtype)
        t = bench_args(looped(step), x, wp, s4, reps=R * T)
    print(f"{form}: {t*1e3:.3f} ms/matvec  ({gb*bytes_per/t:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
