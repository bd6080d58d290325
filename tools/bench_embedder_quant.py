"""7B embedder forward: bf16 weights vs int8 weight-only (per-channel
scales, dequant fused into the matmul — ``hf_loader.quantize_linear_int8``
+ ``layers._linear``).

Validates the perf story of the ``tpu.embedder_quant`` knob: int8 halves
the weight HBM (14.1 -> ~7.2 GB at gte-Qwen2-7B scale, headroom for a
bigger resident index) — this measures what it costs in tok/s. Weights are
random and generated ON DEVICE (uploads crawl through the axon tunnel).

Run: python tools/bench_embedder_quant.py [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from easyrag_tpu.models.layers import DecoderConfig, forward_hidden, init_params

    # gte-Qwen2-7B-instruct architecture
    cfg = DecoderConfig(
        vocab_size=512,  # embed table is a small fraction; shrink for setup
        hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        attention_bias=True, use_flash=jax.default_backend() != "cpu",
        dtype=jnp.bfloat16,
    )
    B, S = args.batch, args.seq

    def param_bytes(params):
        return sum(
            x.nbytes for x in jax.tree.leaves(params) if hasattr(x, "nbytes")
        )

    def quantize_on_device(params):
        """Turn every 2-D matmul weight into int8 + per-channel scale, on
        device (host-side quantization of 7B f32 would need 28 GB RAM)."""

        @jax.jit
        def q8(w):
            wf = w.astype(jnp.float32)
            scale = jnp.abs(wf).max(axis=1) / 127.0
            scale = jnp.where(scale == 0, 1.0, scale)
            wq = jnp.clip(jnp.round(wf / scale[:, None]), -127, 127).astype(jnp.int8)
            return wq, scale

        out = {k: v for k, v in params.items() if k != "layers"}
        out["layers"] = []
        for layer in params["layers"]:
            new = {k: v for k, v in layer.items() if k not in ("attn", "mlp")}
            for group in ("attn", "mlp"):
                new[group] = {}
                for name, leaf in layer[group].items():
                    wq, scale = q8(leaf["w"])
                    ql = {"w_q": wq, "scale": scale}
                    if "b" in leaf:
                        ql["b"] = leaf["b"]
                    new[group][name] = ql
            out["layers"].append(new)
        return out

    params = init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (B, S), 0, 512)
    mask = jnp.ones((B, S), jnp.int32)

    flops = (
        2 * B * S * cfg.num_hidden_layers
        * (2 * 3584 * (28 + 4 + 4) * 128 + 3584 * 3584 + 3 * 3584 * 18944)
        + 4 * B * 28 * S * S * 128 * cfg.num_hidden_layers // 2
    )

    def bench(name, p):
        @jax.jit
        def run():
            h = forward_hidden(cfg, p, ids, mask)
            return h.astype(jnp.float32).sum()

        float(run())  # compile
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name}: {best*1000:.0f} ms  {B*S/best/1000:.1f}k tok/s  "
            f"{flops/best/PEAK*100:.0f}% MFU  "
            f"params {param_bytes(p)/2**30:.1f} GiB",
            flush=True,
        )
        return best

    t_bf16 = bench("bf16", params)
    qparams = quantize_on_device(params)
    t_int8 = bench("int8 weight-only", qparams)
    print(f"int8/bf16 time ratio: {t_int8/t_bf16:.2f}")


if __name__ == "__main__":
    main()
