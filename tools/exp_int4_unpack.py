"""Per-shape int4-matvec bandwidth + unpack-variant probe (r5).

``tools/exp_decode_overhead.py`` pinned the whole B=1 int4 decode gap
inside the matvec chain: 5.87 ms for 3.26 GiB of packed bytes = 595 GB/s
vs the ~700 GB/s the int8 XLA matvec path reaches (r3: 9.9 ms best over
7.1 GiB). This probe answers two questions the decomposition can't:

1. WHERE: per production shape (q/o 3584x3584, k/v 512x3584,
   gate/up 18944x3584, down 3584x18944), what GB/s does the kernel
   actually stream? Small-grid shapes (k/v: grid=1) can't pipeline; big
   shapes tell us the kernel's steady-state ceiling.
2. WHY: is the unpack VPU-bound? The production kernel sign-extends
   bytes to int32 then shifts (3 int32-lane ops per element). Variant
   kernels do the unpack in the int8 domain (``lo8 = (w << 4) >> 4``,
   ``hi8 = w >> 4``, then one cast) — if Mosaic maps int8 shifts onto
   packed lanes, the VPU work quarters and a VPU-bound kernel speeds up;
   if times are identical, the kernel is DMA-bound and the remaining gap
   is grid/pipeline overhead instead.

Timing: R distinct weight copies (reads can't cache) x CHAIN scan passes
per dispatch; one scalar readback; per-matvec = (best - rtt) / (R*CHAIN).

Run: python tools/exp_int4_unpack.py [--shapes q kv gate down] [--json]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # name -> (n_out, n_in) at Qwen2-7B decode shapes
    "q": (3584, 3584),
    "kv": (512, 3584),
    "gate": (18944, 3584),
    "down": (3584, 18944),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="+", default=list(SHAPES),
                    choices=list(SHAPES))
    ap.add_argument("--variants", nargs="+",
                    default=["prod", "i8shift", "xormask"])
    ap.add_argument("--bo", type=int, default=0,
                    help="override the kernel's output-block size "
                         "(0 = production _block_out choice)")
    ap.add_argument("--rows", type=int, default=1,
                    help="activation rows (1 = B=1 decode; pool chunks "
                         "use up to 64)")
    ap.add_argument("--copies", type=int, default=8)
    ap.add_argument("--chain", type=int, default=5,
                    help="scan passes over all copies per dispatch")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import json

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from easyrag_tpu.ops import int4_matvec as m
    from easyrag_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    # ---- kernel variants: identical math, different unpack domain -------
    def k_prod(x_ref, w_ref, s_ref, o_ref, *, half_in):
        m._kernel(x_ref, w_ref, s_ref, o_ref, half_in=half_in)

    def k_i8shift(x_ref, w_ref, s_ref, o_ref, *, half_in):
        w = w_ref[:]  # int8 [bo, I/2]
        lo = ((w << 4) >> 4).astype(x_ref.dtype)  # int8-domain shifts
        hi = (w >> 4).astype(x_ref.dtype)
        acc = jax.lax.dot_general(
            x_ref[:, :half_in], lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            x_ref[:, half_in:], hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)

    def k_xormask(x_ref, w_ref, s_ref, o_ref, *, half_in):
        w = w_ref[:]  # int8; low nibble via mask+xor sign fix, no shifts
        lo = (((w & 15) ^ 8) - 8).astype(x_ref.dtype)
        hi = (w >> 4).astype(x_ref.dtype)
        acc = jax.lax.dot_general(
            x_ref[:, :half_in], lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            x_ref[:, half_in:], hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)

    KERNELS = {"prod": k_prod, "i8shift": k_i8shift, "xormask": k_xormask}

    def call(kname, x, w_p, scale, bo=None):
        rows, n_in = x.shape
        n_out, half_in = w_p.shape
        bo = bo or m._block_out(n_out, half_in)
        kern = functools.partial(KERNELS[kname], half_in=half_in)
        return pl.pallas_call(
            kern,
            grid=(n_out // bo,),
            in_specs=[
                pl.BlockSpec((rows, n_in), lambda o: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bo, half_in), lambda o: (o, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bo), lambda o: (0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, bo), lambda o: (0, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, n_out), x.dtype),
        )(x, w_p, scale.astype(jnp.float32).reshape(1, n_out))

    R, CHAIN = args.copies, args.chain
    rng = jax.random.key(0)
    print(f"backend={jax.default_backend()} copies={R} chain={CHAIN}",
          flush=True)

    null = jax.jit(lambda v: jnp.sum(v))
    xnull = jnp.ones((8,), jnp.float32)
    float(null(xnull))
    rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(null(xnull))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"null dispatch+readback: {rtt * 1000:.2f} ms", flush=True)

    res = {"rtt_ms": round(rtt * 1000, 2), "copies": R, "chain": CHAIN, "rows": args.rows}
    for name in args.shapes:
        n_out, n_in = SHAPES[name]
        half = n_in // 2
        gb = n_out * half / 2**30  # packed bytes per matvec read

        @jax.jit
        def make(key, n_out=n_out, half=half):
            ws, ss = [], []
            for r in range(R):
                k = jax.random.fold_in(key, r)
                ws.append(jax.random.randint(
                    k, (n_out, half), -128, 128, jnp.int32).astype(jnp.int8))
                ss.append(jax.random.uniform(
                    jax.random.fold_in(k, 1), (n_out,), jnp.float32,
                    0.5, 1.5))
            return ws, ss

        ws, ss = make(rng)
        x = jax.random.normal(
            jax.random.fold_in(rng, 99), (args.rows, n_in), jnp.bfloat16)
        bo = args.bo or m._block_out(n_out, half)
        row = {"n_out": n_out, "n_in": n_in, "block_out": bo,
               "grid": n_out // bo, "mb_packed": round(gb * 1024, 2)}

        y_ref = None
        for v in args.variants:
            # numeric parity vs the production unpack (nibbles are exact,
            # so any variant must produce identical bf16 outputs)
            try:
                y = jax.jit(lambda a, b, c, vn=v: call(vn, a, b, c, bo=bo))(
                    x, ws[0], ss[0])
                y.block_until_ready()
            except Exception as e:  # Mosaic may reject int8-domain shifts
                row[v] = {"error": str(e).splitlines()[0][:120]}
                print(f"{name} {v}: FAILED ({row[v]['error']})", flush=True)
                continue
            if y_ref is None:
                y_ref = y
            else:
                import numpy as np

                if not np.array_equal(np.asarray(y, jnp.float32),
                                      np.asarray(y_ref, jnp.float32)):
                    row[v] = {"error": "numeric mismatch vs prod"}
                    print(f"{name} {v}: NUMERIC MISMATCH", flush=True)
                    continue

            @functools.partial(jax.jit, static_argnames=("vn",))
            def chained(x0, ws, ss, vn=v):
                def body(x, _):
                    acc = jnp.zeros((), jnp.float32)
                    for w_p, sc in zip(ws, ss):
                        y = call(vn, x, w_p, sc, bo=bo)
                        acc = acc + jnp.sum(y, dtype=jnp.float32)
                    # fold a scalar back so passes serialize
                    return x + (acc * 1e-20).astype(x.dtype), None

                xf, _ = jax.lax.scan(body, x0, None, length=CHAIN)
                return jnp.sum(xf)

            float(chained(x, ws, ss))  # compile
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(chained(x, ws, ss))
                best = min(best, time.perf_counter() - t0)
            per = max(best - rtt, 1e-9) / (R * CHAIN)
            row[v] = {"us": round(per * 1e6, 1),
                      "gbps": round(gb / per, 1),
                      "below_rtt_noise": best - rtt < 1e-4}
            print(f"{name} [{n_out}x{n_in}] {v}: {per * 1e6:.1f} us  "
                  f"{gb / per:.0f} GB/s", flush=True)
        res[name] = row

    if args.json:
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
