"""Does s8 x s8 beat bf16 inside a Pallas kernel at flash64's shapes?

Decides whether an int8 attention path (quantize q/k after RoPE, s8 QK^T;
quantize softmax probs, s8 PV) is worth building. The open question is the
QK^T contraction depth of 64 (head_dim): bf16 runs it at exactly 50% of
MXU peak (tools/bench_mxu_k64.py); if the int8 pass ALSO halves, int8
still doubles the rate — if int8 needs a deeper contraction for its 2x,
the QK side gains nothing and only PV (contraction S) is worth quantizing.

VMEM-resident fori_loop keeps the 30 ms tunnel RTT out of the numbers
(same harness as bench_mxu_k64).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 16384


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(m, k, n, dtype, reps=REPS):
        acc_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32

        def kernel(a_ref, b_ref, o_ref):
            acc = jnp.zeros((m, n), acc_dtype)

            def body(i, acc):
                # data dependence on acc defeats loop-invariant hoisting:
                # int path xors with a always-zero scalar, float path
                # scales by 1 + eps*acc
                if dtype == jnp.int8:
                    zero = (acc[0, 0] & 0).astype(jnp.int8)
                    a = a_ref[:] ^ zero
                else:
                    a = a_ref[:] * (1.0 + acc[0, 0] * 1e-30).astype(dtype)
                return acc + jnp.dot(a, b_ref[:], preferred_element_type=acc_dtype)

            o_ref[:] = jax.lax.fori_loop(0, reps, body, acc)

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b).sum()

        return run

    nop = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 128), jnp.float32)
    float(nop(z))
    t0 = time.perf_counter()
    for _ in range(10):
        float(nop(z))
    rt = (time.perf_counter() - t0) / 10
    print(f"round trip: {rt*1000:.1f} ms", flush=True)

    shapes = (
        (384, 64, 1152),   # QK^T per packed head pair (contraction = head_dim)
        (384, 1152, 128),  # PV (contraction = S)
        (512, 512, 512),   # peak sanity
    )
    for (m, k, n) in shapes:
        row = [f"[{m},{k}]@[{k},{n}]:"]
        for dtype in (jnp.bfloat16, jnp.int8):
            if dtype == jnp.int8:
                a = jax.random.randint(jax.random.key(0), (m, k), -127, 128, jnp.int8)
                b = jax.random.randint(jax.random.key(1), (k, n), -127, 128, jnp.int8)
            else:
                a = jax.random.normal(jax.random.key(0), (m, k), dtype)
                b = jax.random.normal(jax.random.key(1), (k, n), dtype)
            try:
                f = make(m, k, n, dtype)
                float(f(a, b))
                t0 = time.perf_counter()
                iters = 5
                for _ in range(iters):
                    float(f(a, b))
                per = (time.perf_counter() - t0) / iters - rt
                ops = 2 * m * k * n * REPS
                row.append(
                    f"{dtype.__name__} {ops/per/1e12:6.1f} TOP/s"
                    f" ({per*1e6/REPS:6.2f} us/mm)"
                )
            except Exception as e:  # noqa: BLE001 — Mosaic may reject s8 forms
                row.append(f"{dtype.__name__} FAILED: {str(e)[:120]}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
