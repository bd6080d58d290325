"""Round 2 probe (slim): MXU rate vs contraction depth + flash at S=1024/1280.

Axon notes: checksum barrier, chained ops per dispatch, remote compiles are
30s+ each so keep the variant count tiny.
"""

import sys, os, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 8


def timeit(name, fn, flops=None, iters=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    per = (time.perf_counter() - t0) / iters / CHAIN
    extra = f"  ({flops / per / 1e12:.0f} TFLOP/s)" if flops else ""
    print(f"{name}: {per * 1000:.2f} ms/op{extra}", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    B, H, HD = 32, 36, 64
    S = 1152
    key = jax.random.key(1)

    # --- MXU rate vs contraction depth: batched [S,d]@[d,S] ---------------
    # attention-like: BH batched matmuls. d=64 (head) vs d=128 (packed pair).
    for d, nb in ((64, B * H), (128, B * H // 2)):
        x = jax.random.normal(jax.random.key(2), (nb, S, d), jnp.bfloat16)
        y = jax.random.normal(jax.random.key(3), (nb, d, S), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(4), (nb, S, d), jnp.bfloat16)

        def run(c, y, w):
            def body(c, _):
                lg = jnp.einsum("bqd,bdk->bqk", c, y,
                                preferred_element_type=jnp.float32)
                out = jnp.einsum("bqk,bkd->bqd", lg.astype(jnp.bfloat16), w)
                return out, ()
            f, _ = jax.lax.scan(body, c, None, length=CHAIN)
            return f.astype(jnp.float32).sum()

        flops = 2 * nb * S * S * d * 2  # QK-like + AV-like
        timeit(f"batched mm d={d} nb={nb} (QK+AV shapes)",
               lambda f=jax.jit(run), xx=x, yy=y, ww=w: float(f(xx, yy, ww)), flops=flops)

    # --- AV^T form: out^T = V^T A^T, full-128 contraction -----------------
    nb = B * H
    a = jax.random.normal(jax.random.key(5), (nb, S, S), jnp.bfloat16)  # 3GB... too big
    del a

    # --- flash at 1024 / 1280 (best-block guesses) -------------------------
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    def flash(q, k, v, seg, bq, bk):
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq,
                        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
        return flash_attention(q, k, v, segment_ids=SegmentIds(seg, seg),
                               causal=True, sm_scale=HD ** -0.5, block_sizes=bs)

    for S2, bq, bk in ((1024, 512, 1024), (1280, 256, 1280)):
        ks = jax.random.split(jax.random.fold_in(key, S2), 3)
        q = jax.random.normal(ks[0], (B, H, S2, HD), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, S2, HD), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, S2, HD), jnp.bfloat16)
        m = np.ones((B, S2), np.int32); m[:, : S2 - min(S2, 1064)] = 0
        seg = jnp.asarray(m)

        def run(q, k, v, seg, bq=bq, bk=bk):
            def body(c, _):
                return flash(c, k, v, seg, bq, bk).astype(c.dtype), ()
            f, _ = jax.lax.scan(body, q, None, length=CHAIN)
            return f.astype(jnp.float32).sum()

        try:
            timeit(f"flash S={S2} b{bq}x{bk}",
                   lambda f=jax.jit(run, static_argnames=()), qq=q, kk=k, vv=v, ss=seg: float(f(qq, kk, vv, ss)))
        except Exception as e:
            print(f"flash S={S2} FAILED: {str(e)[:100]}")


if __name__ == "__main__":
    main()
