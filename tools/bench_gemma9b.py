"""Gemma v2.5-lightweight at true scale (VERDICT r2 item #6): size and run
bge-reranker-v2.5-gemma2-lightweight (Gemma2-9B body) on one v5e with int8
weight-only matmuls, token compression at ``compress_layer=[24,40]``,
``compress_ratio=2`` (``/root/reference/src/easyrag/custom/rerankers.py:
164-176``) — what does a 32-pair batch cost, and what does compression save?

Weights are random, generated directly as int8 leaves ON DEVICE (~8.3 GB
matmuls + 1.8 GB bf16 embed table; the bf16 tree would be ~18.5 GB and
not fit). Attention defaults to the softcap-capable fused kernel
(``ops/flash_softcap.py``, round 4): the einsum path materializes the
[B,H,S,S] f32 logits (~2 GiB per 32-pair batch, the peak-memory driver —
measure it with ``--no-flash``); the batch auto-halves on OOM and the
realized batch is reported.

Run: python tools/bench_gemma9b.py [--batch 32] [--iters 3] [--no-flash]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_pipeline import CharTokenizer  # noqa: E402


def make_gemma_params_int8(cfg, key, start_layer: int, layer_sep: int = 1):
    """Random int8-leaf Gemma params (layout of hf_loader.quantize_linear_
    int8 + gemma norms + per-layer heads), generated on device in ONE
    dispatch (per-leaf dispatches each pay the tunnel round trip)."""
    import jax

    return jax.jit(_gemma_tree_int8, static_argnums=(0, 2, 3))(
        cfg, key, start_layer, layer_sep
    )


def _gemma_tree_int8(cfg, key, start_layer: int, layer_sep: int):
    import jax
    import jax.numpy as jnp

    def q8(key, n_in, n_out):
        w_q = jax.random.randint(key, (n_out, n_in), -127, 128, jnp.int32).astype(jnp.int8)
        return {"w_q": w_q, "scale": jnp.full((n_out,), 0.02 / 73.0, jnp.float32)}

    d, hd = cfg.hidden_size, cfg.hd
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    layers = []
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[i], 8)
        layers.append(
            {
                "input_norm": jnp.zeros((d,), cfg.dtype),
                "post_attn_norm": jnp.zeros((d,), cfg.dtype),
                "pre_mlp_norm": jnp.zeros((d,), cfg.dtype),
                "post_mlp_norm": jnp.zeros((d,), cfg.dtype),
                "attn": {
                    "q": q8(k[0], d, cfg.num_attention_heads * hd),
                    "k": q8(k[1], d, cfg.num_key_value_heads * hd),
                    "v": q8(k[2], d, cfg.num_key_value_heads * hd),
                    "o": q8(k[3], cfg.num_attention_heads * hd, d),
                },
                "mlp": {
                    "gate": q8(k[4], d, cfg.intermediate_size),
                    "up": q8(k[5], d, cfg.intermediate_size),
                    "down": q8(k[6], cfg.intermediate_size, d),
                },
            }
        )
    heads = {
        layer: jax.random.normal(
            jax.random.fold_in(keys[-1], layer), (1, d), jnp.float32
        ) * 0.02
        for layer in range(start_layer, cfg.num_hidden_layers + 1, layer_sep)
    }
    return {
        "embed": jax.random.normal(keys[-2], (cfg.vocab_size, d), cfg.dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.zeros((d,), cfg.dtype),
        "heads": heads,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--pairs-len", type=int, default=950,
                    help="passage chars (1 char = 1 token via CharTokenizer)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tool smoke test)")
    ap.add_argument("--w8a8", action="store_true",
                    help="dynamic per-token activation int8 (layers."
                         "DecoderConfig.act_quant) — weights are already s8")
    ap.add_argument("--no-flash", action="store_true",
                    help="einsum attention (the pre-r4 path; materializes "
                         "the [B,H,S,S] f32 softcapped logits)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from easyrag_tpu.models.gemma import GemmaCostWiseReranker
    from easyrag_tpu.models.layers import DecoderConfig

    if args.tiny:
        arch = dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=6, num_attention_heads=2, num_key_value_heads=1,
            head_dim=32, query_pre_attn_scalar=32.0, attn_logit_softcapping=50.0,
        )
        cutoff, comp_layers, start_layer = 5, (3, 40), 1
    else:
        # Gemma2-9B body (bge-reranker-v2.5-gemma2-lightweight):
        # 42 layers, d 3584, 16x256 heads (8 kv), inter 14336, softcap 50
        arch = dict(
            vocab_size=256_000, hidden_size=3584, intermediate_size=14336,
            num_hidden_layers=42, num_attention_heads=16, num_key_value_heads=8,
            head_dim=256, query_pre_attn_scalar=256.0, attn_logit_softcapping=50.0,
        )
        # reference operating point: cutoff 28, compress at [24, 40] ratio 2
        # (the 40 point sits above the cutoff and is skipped, as in the
        # reference where only layers < cutoff run)
        cutoff, comp_layers, start_layer = 28, (24, 40), 8
    cfg = DecoderConfig(
        gemma=True, dtype=jnp.bfloat16, act_quant=args.w8a8,
        use_flash=not args.no_flash and jax.default_backend() != "cpu",
        **arch,
    )

    params = make_gemma_params_int8(cfg, jax.random.key(0), start_layer)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"params on device: {nbytes/2**30:.2f} GiB "
          f"(embed {params['embed'].nbytes/2**30:.2f})", flush=True)

    rng = np.random.default_rng(0)

    def mk_pairs(n):
        def text(n_chars):
            return "".join(chr(0x4E00 + rng.integers(0, 3000)) for _ in range(n_chars))

        return [(text(24), text(args.pairs_len)) for _ in range(n)]

    B = args.batch
    results = {}
    for name, layers_ in (("compress@24", comp_layers), ("no-compress", ())):
        scorer = GemmaCostWiseReranker(
            cfg, params, CharTokenizer(arch["vocab_size"]),
            cutoff_layer=cutoff, compress_layer=layers_, compress_ratio=2,
            max_length=1024 if not args.tiny else 128,
        )
        pairs = mk_pairs(B)
        while True:
            try:
                t0 = time.perf_counter()
                scores, layer = scorer.score_pairs(pairs)
                print(f"[{name}] B={len(pairs)} compile+first "
                      f"{time.perf_counter()-t0:.1f}s", flush=True)
                break
            except Exception as e:
                msg = str(e)
                if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg or "OOM" in msg.upper():
                    if len(pairs) <= 4:
                        raise
                    pairs = pairs[: len(pairs) // 2]
                    print(f"[{name}] OOM -> retry at B={len(pairs)}", flush=True)
                else:
                    raise
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            scores, _ = scorer.score_pairs(pairs)
            float(np.sum(scores))  # host materialization barrier
            best = min(best, time.perf_counter() - t0)
        bq = len(pairs)
        print(f"[{name}] {best*1000:.0f} ms / {bq}-pair batch "
              f"({best/bq*1000:.1f} ms/pair)", flush=True)
        results[name] = {"ms_per_batch": round(best * 1000, 1), "batch": bq,
                         "ms_per_pair": round(best / bq * 1000, 2)}

    if "compress@24" in results and "no-compress" in results:
        a = results["compress@24"]["ms_per_pair"]
        b = results["no-compress"]["ms_per_pair"]
        results["compression_saving_pct"] = round((1 - a / b) * 100, 1)
    results["params_gib"] = round(nbytes / 2**30, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
