"""VPU op rates on v5e (exp / where / max / mul) — sizing the softmax wall
of the flash64 kernel. Chained in-kernel loop, checksum barrier, RT-subtracted.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 2048
M, N = 512, 1024  # f32 tile, 2MB


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(op):
        def kernel(x_ref, o_ref):
            def body(i, x):
                return op(x * (1.0 + 1e-30 * x[0, 0]))
            o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x).sum()
        return run

    x = jax.random.normal(jax.random.key(0), (M, N), jnp.float32) * 0.1

    nop = jax.jit(lambda v: v.sum())
    z = jnp.zeros((8, 128), jnp.float32)
    float(nop(z))
    t0 = time.perf_counter()
    for _ in range(10):
        float(nop(z))
    rt = (time.perf_counter() - t0) / 10
    print(f"round trip: {rt*1000:.1f} ms")

    ops = {
        "mul(x,1.0001)": lambda v: v * 1.0001,
        "exp": jnp.exp,
        "exp2": jnp.exp2,
        "tanh": jnp.tanh,
        "where(x>0,x,-x)": lambda v: jnp.where(v > 0, v, -v),
        "max-reduce+bcast": lambda v: v - jnp.max(v, axis=1, keepdims=True) * 1e-6,
        "sum-reduce+bcast": lambda v: v - jnp.sum(v, axis=1, keepdims=True) * 1e-9,
    }
    for name, op in ops.items():
        f = make(op)
        float(f(x))
        t0 = time.perf_counter(); iters = 5
        for _ in range(iters):
            float(f(x))
        per = (time.perf_counter() - t0) / iters - rt
        rate = M * N * REPS / per
        print(f"{name}: {rate/1e9:8.1f} Gelem/s ({per/REPS*1e6:6.2f} us/pass)",
              flush=True)


if __name__ == "__main__":
    main()
