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
import functools
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
    ap.add_argument(
        "--tiny", action="store_true",
        help="2-layer toy model: smoke-tests the tool itself (CPU-safe)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from easyrag_tpu.models.layers import DecoderConfig, forward_hidden, init_params

    # gte-Qwen2-7B-instruct architecture
    arch = dict(
        hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
    )
    if args.tiny:
        arch = dict(
            hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        )
    cfg = DecoderConfig(
        vocab_size=512,  # embed table is a small fraction; shrink for setup
        attention_bias=True, use_flash=jax.default_backend() != "cpu",
        dtype=jnp.bfloat16, **arch,
    )
    B, S = args.batch, args.seq

    def param_bytes(params):
        return sum(
            x.nbytes for x in jax.tree.leaves(params) if hasattr(x, "nbytes")
        )

    def quantize_on_device(params):
        """Turn every 2-D matmul weight into int8 + per-channel scale, on
        device (host-side quantization of 7B f32 would need 28 GB RAM).

        DESTRUCTIVE: consumes ``params`` leaf by leaf (donated buffers) so
        the bf16 and int8 trees never coexist — together they would not
        fit a 16 GB chip at 7B scale."""

        @functools.partial(jax.jit, donate_argnums=0)
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
                    wq, scale = q8(leaf.pop("w"))
                    ql = {"w_q": wq, "scale": scale}
                    if "b" in leaf:
                        ql["b"] = leaf["b"]
                    new[group][name] = ql
            out["layers"].append(new)
            layer.clear()
        params["layers"].clear()
        return out

    params = init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (B, S), 0, 512)
    mask = jnp.ones((B, S), jnp.int32)

    d, i, hd = cfg.hidden_size, cfg.intermediate_size, cfg.hd
    nh, nkv, L = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.num_hidden_layers
    # dense: q+o = 2*d*nh*hd, k+v = 2*d*nkv*hd, mlp = 3*d*i (per token-layer)
    flops = (
        2 * B * S * L * (2 * d * nh * hd + 2 * d * nkv * hd + 3 * d * i)
        + 4 * B * nh * S * S * hd * L // 2  # causal attention
    )

    # params/ids must be jit ARGUMENTS: a closure would capture the 13 GB
    # tree as HLO constants and blow the remote-compile program size limit
    @jax.jit
    def run(p, ids, mask):
        h = forward_hidden(cfg, p, ids, mask)
        return h.astype(jnp.float32).sum()

    import dataclasses

    cfg_a8 = dataclasses.replace(cfg, act_quant=True)

    @jax.jit
    def run_a8(p, ids, mask):
        h = forward_hidden(cfg_a8, p, ids, mask)
        return h.astype(jnp.float32).sum()

    def bench(name, p, run=run):
        float(run(p, ids, mask))  # compile
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(p, ids, mask))
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
    # w8a8: same int8 weights, activations dynamic-quantized per token so
    # projections contract s8 x s8 at the MXU's double int8 rate
    t_a8 = bench("w8a8", qparams, run=run_a8)
    print(f"int8/bf16 time ratio: {t_int8/t_bf16:.2f}  "
          f"w8a8/bf16: {t_a8/t_bf16:.2f}")


if __name__ == "__main__":
    main()
