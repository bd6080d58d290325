"""Local-LLM decode throughput at Qwen2-7B-Instruct scale.

Measures the TPU generation path (``models/decode.py``: bucketed prefill +
KV-cache greedy loop) that backs ``tpu.local_llm_backend="jax"`` — the
reference's local option runs HF ``model.generate`` on a 16 GB GPU
(``/root/reference/src/easyrag/utils/llm_utils.py:58-73``).

Method: weights are random, generated ON DEVICE (uploads crawl through the
axon tunnel; timing is identical to real weights). Two timed runs at the
same prompt bucket — ``max_new=1`` (≈ prefill cost) and ``max_new=1+N``
— so the difference isolates N pure decode steps. EOS is a sentinel that
never fires, so the while_loop runs all N steps. Completion barrier is a
device->host scalar readback of the output tokens' sum.

Run: python tools/bench_decode.py [--quant int8] [--batch 1] [--tiny]

``--spec K`` measures prompt-lookup speculative decoding
(``generate_greedy_spec``): decode is weight-bandwidth-bound, so a verify
block over K+1 positions should cost about one plain step. Three rows:
the plain step (baseline), the verify-block step at ZERO acceptance (a
random prompt drafts garbage at a 152k vocab — every iteration emits one
token, so iteration time IS the verify cost), and the FULL-acceptance
ceiling: the lm_head is zeroed, making argmax constant, so after a warm-up
the drafter copies the model's own continuation exactly — same weights
read per step, genuine end-to-end machinery (lookup + scatter + acceptance
bookkeeping), acceptance K/K. Real answers land between the two by their
copy rate; exactness is pinned in tests/test_decode_spec.py.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int8",
                    choices=["bf16", "int8", "w8a8", "int4", "w4a8"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt", type=int, default=1024, help="prompt bucket")
    ap.add_argument("--new", type=int, default=64, help="decode steps timed")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--json", action="store_true",
                    help="also print one machine-readable JSON line")
    ap.add_argument(
        "--tiny", action="store_true",
        help="2-layer toy model: smoke-tests the tool itself (CPU-safe)",
    )
    ap.add_argument("--spec", type=int, default=0, metavar="K",
                    help="measure prompt-lookup speculative decoding with "
                         "K drafted tokens per verify block")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from easyrag_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # 7B graph compiles cost 10+ min on the tunnel

    from easyrag_tpu.models.decode import generate_greedy
    from easyrag_tpu.models.hf_loader import (
        quantize_linear_int4_device,
        quantize_linear_int8_device,
    )
    from easyrag_tpu.models.layers import DecoderConfig, init_params

    # Qwen2-7B-Instruct architecture (what the reference points
    # local_llm_name / llmlingua at)
    arch = dict(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        attention_bias=True, rope_theta=1e6,
    )
    if args.tiny:
        arch = dict(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, attention_bias=True,
        )
    cfg = DecoderConfig(
        dtype=jnp.bfloat16,
        use_flash=jax.default_backend() != "cpu",
        **arch,
    )
    if args.quant in ("w8a8", "w4a8"):
        cfg = dataclasses.replace(cfg, act_quant=True)

    print(f"backend={jax.default_backend()} quant={args.quant}", flush=True)

    # ONE jitted dispatch for the whole tree: per-leaf dispatches each pay
    # the ~30 ms tunnel round trip (~200 of them stall for minutes — same
    # lesson as tools/bench_pipeline.py::make_embedder_params_int8)
    qdev = {
        "int8": quantize_linear_int8_device,
        "w8a8": quantize_linear_int8_device,
        "int4": quantize_linear_int4_device,
        "w4a8": quantize_linear_int4_device,
    }.get(args.quant)

    def build(key):
        p = init_params(cfg, key)
        # untied head, the Qwen2-7B-Instruct layout; quantized like the
        # loader does (the decode step reads the whole [V, D] table)
        head = jax.random.normal(
            jax.random.fold_in(key, 7), (cfg.vocab_size, cfg.hidden_size),
            cfg.dtype,
        ) * 0.02
        p["lm_head"] = qdev(head) if qdev else {"w": head}
        if qdev:
            for layer in p["layers"]:
                for group in ("attn", "mlp"):
                    for name, lin in list(layer[group].items()):
                        rest = {k: v for k, v in lin.items() if k != "w"}
                        layer[group][name] = {**qdev(lin["w"]), **rest}
        if args.quant in ("int4", "w4a8"):
            # production layout (JaxCausalLM does the same): fused q+k+v /
            # gate+up packed matvecs — 196 -> 112 dispatches per step
            from easyrag_tpu.models.hf_loader import fuse_decode_tree

            p = fuse_decode_tree(p)
        return p

    params = jax.jit(build)(jax.random.key(0))
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"params: {nbytes / 2**30:.2f} GiB", flush=True)

    B, S, N = args.batch, args.prompt, args.new
    rng = jax.random.key(1)
    ids = jax.random.randint(rng, (B, S), 0, cfg.vocab_size, jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    eos = jnp.asarray([-1], jnp.int32)  # never fires: all N steps run

    def run(max_new):
        out = generate_greedy(cfg, params, ids, mask, eos, max_new)
        return int(jnp.sum(out))  # scalar readback barrier

    def best_of(max_new):
        run(max_new)  # compile
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run(max_new)
            best = min(best, time.perf_counter() - t0)
        return best

    t_prefill = best_of(1)
    if args.json:
        import json

        # cumulative emission (bench.py merges every JSON line): a budget
        # kill during the longer full-decode compile still salvages prefill
        print(json.dumps({
            "prefill_tok_s": round(B * S / t_prefill, 0),
            "batch": B, "prompt": S, "quant": args.quant,
        }), flush=True)
    t_full = best_of(1 + N)
    dec = (t_full - t_prefill) / N
    print(
        f"prefill+1: {t_prefill * 1e3:.1f} ms "
        f"({B * S / t_prefill:.0f} tok/s prefill)"
    )
    print(
        f"decode: {dec * 1e3:.2f} ms/step -> {B / dec:.1f} tok/s "
        f"(batch {B}; {1 / dec:.1f} steps/s)"
    )
    if args.json:
        import json

        print(json.dumps({
            "decode_ms_step": round(dec * 1e3, 2),
            "decode_tok_s": round(B / dec, 1),
            "prefill_tok_s": round(B * S / t_prefill, 0),
            "batch": B, "prompt": S, "quant": args.quant,
        }))

    if args.spec:
        from easyrag_tpu.models.decode import generate_greedy_spec

        K = args.spec

        def run_spec(p, max_new):
            out = generate_greedy_spec(
                cfg, p, ids, mask, eos, max_new, draft_len=K
            )
            return int(jnp.sum(out))

        def best_of_spec(p, max_new):
            run_spec(p, max_new)  # compile
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                run_spec(p, max_new)
                best = min(best, time.perf_counter() - t0)
            return best

        # natural acceptance: random prompt, real (random-weight) head —
        # random-weight greedy continuations often cycle, so some drafts
        # accept; this is the workload-dependent middle, not a floor
        t1 = best_of_spec(params, 1)
        tn = (best_of_spec(params, 1 + N) - t1) / N
        if args.json:
            import json

            print(json.dumps({
                "spec_k": K, "spec_tok_s_natural": round(B / tn, 1),
            }), flush=True)
        # full acceptance: constant-argmax model (zeroed head) + a zero-run
        # prompt tail the drafter can copy from — every block emits K+1
        # tokens. Same weight bytes per step as real decode.
        zero_head = jax.tree.map(jnp.zeros_like, params["lm_head"])
        params0 = {**params, "lm_head": zero_head}
        ids = ids.at[:, -64:].set(0)  # run_spec closes over `ids`
        t1f = best_of_spec(params0, 1)
        tf = (best_of_spec(params0, 1 + N) - t1f) / N  # per emitted token
        block_ms = tf * (K + 1) * 1e3  # one verify-block forward
        worst = block_ms / 1e3  # zero acceptance: 1 token per block
        print(
            f"spec K={K}: verify block {block_ms:.2f} ms "
            f"({block_ms / (dec * 1e3):.2f}x plain step); full-acceptance "
            f"{B / tf:.1f} tok/s ({dec / tf:.1f}x plain), natural "
            f"(random-weight) {B / tn:.1f} tok/s, zero-acceptance floor "
            f"{B / worst:.1f} tok/s"
        )
        if args.json:
            print(json.dumps({
                "spec_k": K,
                "verify_block_ms": round(block_ms, 2),
                "verify_vs_plain": round(block_ms / (dec * 1e3), 3),
                "spec_tok_s_full_accept": round(B / tf, 1),
                "spec_ceiling_vs_plain": round(dec / tf, 2),
                "spec_tok_s_natural": round(B / tn, 1),
                "spec_tok_s_floor": round(B / worst, 1),
                "batch": B, "prompt": S, "quant": args.quant,
            }))


if __name__ == "__main__":
    main()
