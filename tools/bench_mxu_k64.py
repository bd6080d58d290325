"""Raw MXU rate at contraction depth 64 vs 128 (VMEM-resident Pallas loop).

Decides the flash64 kernel design: if [.,64]@[64,.] runs at ~50% of the
[.,128]@[128,.] rate, plain per-head matmuls are fine (the +/- packing trick
has identical elapsed); if it's worse than 50%, packing wins.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 16384


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(m, k, n, reps=REPS):
        def kernel(a_ref, b_ref, o_ref):
            acc = jnp.zeros((m, n), jnp.float32)
            def body(i, acc):
                # scalar dependence on acc defeats loop-invariant hoisting
                a = a_ref[:] * (1.0 + acc[0, 0] * 1e-30).astype(jnp.bfloat16)
                return acc + jnp.dot(a, b_ref[:],
                                     preferred_element_type=jnp.float32)
            acc = jax.lax.fori_loop(0, reps, body, acc)
            o_ref[:] = acc

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
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
    print(f"round trip: {rt*1000:.1f} ms")

    for (m, k, n) in ((384, 64, 1152), (384, 128, 1152), (384, 256, 1152),
                      (1152, 64, 384), (384, 1152, 64), (384, 1152, 128),
                      (512, 512, 512)):
        a = jax.random.normal(jax.random.key(0), (m, k), jnp.bfloat16)
        b = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)
        f = make(m, k, n)
        float(f(a, b))
        t0 = time.perf_counter(); iters = 5
        for _ in range(iters):
            float(f(a, b))
        per = (time.perf_counter() - t0) / iters - rt
        fl = 2 * m * k * n * REPS
        print(f"[{m},{k}]@[{k},{n}]: {fl/per/1e12:6.1f} TFLOP/s "
              f"({per*1e6/REPS:7.2f} us/mm)", flush=True)


if __name__ == "__main__":
    main()
