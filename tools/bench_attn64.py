"""Attention-kernel shootout at the reranker's shape (head_dim 64).

MiniCPM-2B reranker hot loop: B=32, H=36, hd=64, S~1064 (pairs padded x8).
Round 1 ran jax flash with 512-blocks, which forces S%512==0 -> padding
1064->1536 (44% wasted tokens through the whole model). This script measures
candidate kernels at S=1152 (128-multiple, 8% padding) on the real TPU so the
model bucket can drop.

Honest timing: axon's block_until_ready doesn't sync; every sample chains a
4-byte checksum readback. Run: python tools/bench_attn64.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=5):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    per = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {per:.2f} ms", flush=True)
    return per


CHAIN = 16  # ops chained per dispatch to amortize the ~30ms tunnel round trip


def chained(attn_fn):
    """attn applied CHAIN times inside one jit; carry feeds forward so XLA
    cannot CSE the repeats. Returns a (q,k,v,mask)->float checksum callable."""
    import jax
    import jax.numpy as jnp

    def run(q, k, v, m):
        def body(carry, _):
            out = attn_fn(carry, k, v, m)
            return out.astype(carry.dtype), ()
        final, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return final.astype(jnp.float32).sum()

    return jax.jit(run)


def main():
    import jax
    import jax.numpy as jnp

    B, H, HD = 32, 36, 64
    key = jax.random.key(0)

    def make_qkv(S, dtype=jnp.bfloat16):
        ks = jax.random.split(jax.random.fold_in(key, S), 3)
        q = jax.random.normal(ks[0], (B, H, S, HD), dtype)
        k = jax.random.normal(ks[1], (B, H, S, HD), dtype)
        v = jax.random.normal(ks[2], (B, H, S, HD), dtype)
        # left padding: first S-1064 positions are pad (mask 0)
        mask = np.ones((B, S), np.int32)
        mask[:, : max(S - 1064, 0)] = 0
        return q, k, v, jnp.asarray(mask)

    scale = HD ** -0.5

    # ---- einsum reference -------------------------------------------------
    def einsum_attn(q, k, v, mask):
        S = q.shape[2]
        causal = jnp.tril(jnp.ones((S, S), bool))
        keep = causal[None, None] & (mask[:, None, None, :] > 0)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    # ---- jax flash --------------------------------------------------------
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    def flash(q, k, v, mask, blk_q, blk_k):
        seg = mask.astype(jnp.int32)
        bs = BlockSizes(
            block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
            block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
            block_k_dkv=blk_k, block_q_dkv=blk_q,
            block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk_q,
        )
        return flash_attention(q, k, v, segment_ids=SegmentIds(seg, seg),
                               causal=True, sm_scale=scale, block_sizes=bs)

    results = {}
    for S in (1152, 1536):
        q, k, v, mask = make_qkv(S)
        f = chained(einsum_attn)
        try:
            results[f"einsum_S{S}"] = timeit(
                f"einsum S={S}", lambda: float(f(q, k, v, mask)), iters=3) / CHAIN
            print(f"  -> {results[f'einsum_S{S}']:.2f} ms/op")
        except Exception as e:
            print(f"einsum S={S} FAILED: {str(e)[:120]}")

        for blk_q, blk_k in ((128, 128), (256, 256), (384, 384), (512, 512),
                             (256, 576), (384, 1152)):
            if S % blk_q or S % blk_k:
                continue
            ff = chained(lambda q, k, v, m, bq=blk_q, bk=blk_k:
                         flash(q, k, v, m, bq, bk))
            try:
                r = timeit(
                    f"flash S={S} blocks {blk_q}x{blk_k}",
                    lambda: float(ff(q, k, v, mask)), iters=3) / CHAIN
                results[f"flash_S{S}_b{blk_q}x{blk_k}"] = r
                print(f"  -> {r:.2f} ms/op")
            except Exception as e:
                print(f"flash S={S} b{blk_q}x{blk_k} FAILED: {str(e)[:120]}")

    # ---- splash -----------------------------------------------------------
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )
        S = 1152
        q, k, v, mask = make_qkv(S)
        mk = sm.MultiHeadMask([sm.CausalMask((S, S)) for _ in range(H)])
        kernel = sk.make_splash_mha(mk, head_shards=1, q_seq_shards=1)
        seg = sk.SegmentIds(mask.astype(jnp.int32), mask.astype(jnp.int32))

        def one(qi, ki, vi, segi):
            return kernel(qi * scale, ki, vi, segment_ids=segi)

        def splash_attn(q, k, v, m):
            seg = sk.SegmentIds(m.astype(jnp.int32)[0], m.astype(jnp.int32)[0])
            return jax.vmap(one, in_axes=(0, 0, 0, None))(q, k, v, seg)
        fsp = chained(splash_attn)
        results["splash_S1152"] = timeit(
            "splash S=1152", lambda: float(fsp(q, k, v, mask)), iters=3) / CHAIN
        print(f"  -> {results['splash_S1152']:.2f} ms/op")
    except Exception as e:
        print(f"splash FAILED: {type(e).__name__} {str(e)[:200]}")

    print("\nideal attention time at 197 TFLOP/s:")
    for S in (1152, 1536):
        flops = 4 * B * H * S * S * HD  # QK^T + AV, causal halves it
        print(f"  S={S}: full {flops/197e12*1000:.1f} ms, causal ~{flops/2/197e12*1000:.1f} ms")


if __name__ == "__main__":
    main()
