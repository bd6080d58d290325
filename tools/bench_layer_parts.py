"""Decompose one MiniCPM-2B decoder layer's cost on the real chip.

Chained-in-one-jit component timings: full layer, attention-only (flash /
einsum), mlp-only, qkvo-projections-only, norms+rope-only. Identifies where
the dense-path MFU goes (tools/bench_reranker.py shows ~67% on the dense
part at S=1152).
"""

import sys, os, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 16


def timeit(name, f, args, flops=None, iters=3):
    float(f(*args))  # float() is the sync barrier (axon ignores block_until_ready)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    per = (time.perf_counter() - t0) / iters / CHAIN
    extra = f"  ({flops/per/1e12:.0f} TFLOP/s)" if flops else ""
    print(f"{name}: {per*1000:.2f} ms{extra}", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from easyrag_tpu.models.layers import (
        DecoderConfig, attention, attention_bias_from_mask, decoder_layer,
        init_params, mlp, rms_norm, rope_tables, _linear)

    B, S = 32, 1152
    cfg = DecoderConfig(
        vocab_size=512, hidden_size=2304, intermediate_size=5760,
        num_hidden_layers=1, num_attention_heads=36, num_key_value_heads=36,
        scale_emb=12.0, scale_depth=1.4, dim_model_base=256.0,
        use_flash=True, dtype=jnp.bfloat16)
    params = init_params(cfg, jax.random.key(0))["layers"][0]
    x = jax.random.normal(jax.random.key(1), (B, S, 2304), jnp.bfloat16)
    m = np.ones((B, S), np.int32); m[:, :S - 1064] = 0
    mask = jnp.asarray(m)

    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    cos, sin = rope_tables(pos, cfg.hd, cfg.rope_theta)
    bias = attention_bias_from_mask(mask)

    def chain(fn):
        def run(x, p, mask, cos, sin, bias):
            def body(c, _):
                return fn(c, p, mask, cos, sin, bias).astype(c.dtype), ()
            f, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return f.astype(jnp.float32).sum()
        return jax.jit(run)

    d, I = 2304, 5760
    dense_flops = 2 * (4 * d * d + 3 * d * I) * B * S
    attn_flops = 4 * B * 36 * S * S * 64 // 2
    qkvo_flops = 2 * 4 * d * d * B * S
    mlp_flops = 2 * 3 * d * I * B * S

    timeit("full layer (flash)", chain(
        lambda c, p, mask, cos, sin, bias:
        decoder_layer(cfg, p, c, bias, cos, sin, mask=mask)),
        (x, params, mask, cos, sin, bias), flops=dense_flops + attn_flops)

    timeit("attention block (flash, incl. qkvo+rope)", chain(
        lambda c, p, mask, cos, sin, bias:
        attention(cfg, p["attn"], c, bias, cos, sin, mask=mask)),
        (x, params, mask, cos, sin, bias), flops=qkvo_flops + attn_flops)

    timeit("mlp only", chain(
        lambda c, p, mask, cos, sin, bias: mlp(cfg, p["mlp"], c)),
        (x, params, mask, cos, sin, bias), flops=mlp_flops)

    def qkvo_only(c, p, mask, cos, sin, bias):
        a = p["attn"]
        q = _linear(c, a["q"])
        k = _linear(c, a["k"])
        v = _linear(c, a["v"])
        return _linear(q + k + v, a["o"])
    timeit("qkvo projections only", chain(qkvo_only),
           (x, params, mask, cos, sin, bias), flops=qkvo_flops)

    def norms_rope(c, p, mask, cos, sin, bias):
        h = rms_norm(c, p["input_norm"], cfg.rms_norm_eps)
        q = h.reshape(B, S, 36, 64)
        from easyrag_tpu.models.layers import apply_rope
        q = apply_rope(q, cos, sin).reshape(B, S, 2304)
        return rms_norm(q, p["post_norm"], cfg.rms_norm_eps)
    timeit("norms + one rope (VPU/HBM)", chain(norms_rope),
           (x, params, mask, cos, sin, bias))


if __name__ == "__main__":
    main()
