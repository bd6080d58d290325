"""int4 / w4a8 quality floor vs bf16 (VERDICT r4 #6).

The r4 driver bench features int4 as the production decode config, but its
quality story was one sentence ("~16x coarser rounding than int8"). This
tool puts a NUMBER next to that sentence, on random weights — the only
weights available in this environment — with int8/w8a8 measured alongside
as the accepted-quality anchors, so "int4 relative to int8" is readable
even where absolute agreement is pessimistic.

Two measurements per quant mode, all from the SAME bf16 master weights:

1. **Teacher-forced argmax agreement**: identical token prompts through
   ``forward_hidden`` + the lm head under bf16 and under the quantized
   weights; fraction of positions whose next-token argmax matches, plus
   top-5 overlap and the rank the bf16 argmax falls to under quant.
   Teacher forcing isolates per-step numerics from divergence cascades.
2. **Greedy generation stability**: ``generate_greedy`` from the same
   prompts; mean matched-prefix length and overall token match rate over
   ``--new`` steps — the divergence cascade, i.e. what an answer string
   actually experiences (reference generation contract:
   ``/root/reference/src/easyrag/pipeline/rag.py:26-39``).

Caveat (recorded in BASELINE.md next to the numbers): random-weight logits
are near-exchangeable across a 152k vocab, so ABSOLUTE agreement
understates real-checkpoint agreement, where logit margins are large. The
int8 row anchors the scale; the standing real-weight gate
(tests/test_checkpoint_boot.py loader) upgrades this to a real parity
measurement the moment a checkpoint is present.

Run:  python tools/exp_int4_quality.py --scale 2b --json
      python tools/exp_int4_quality.py --scale tiny     (CPU smoke)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = {
    # hidden, intermediate, layers, heads, kv_heads, vocab
    "tiny": dict(vocab_size=512, hidden_size=128, intermediate_size=256,
                 num_hidden_layers=2, num_attention_heads=2,
                 num_key_value_heads=1),
    # ~1.9B params at Qwen2-ish shapes: the reranker-class scale the
    # verdict asked for ("argmax agreement rate vs bf16 ... at 2B scale")
    "2b": dict(vocab_size=151936, hidden_size=1536, intermediate_size=8960,
               num_hidden_layers=28, num_attention_heads=12,
               num_key_value_heads=2),
    # Qwen2-7B-Instruct: the four-tenant generator itself
    "7b": dict(vocab_size=152064, hidden_size=3584, intermediate_size=18944,
               num_hidden_layers=28, num_attention_heads=28,
               num_key_value_heads=4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="2b", choices=sorted(SCALES))
    ap.add_argument("--quants", nargs="+",
                    default=["int8", "w8a8", "int4", "w4a8"])
    ap.add_argument("--prompts", type=int, default=16)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--new", type=int, default=32,
                    help="greedy generation steps for the stability row")
    ap.add_argument("--chunk", type=int, default=4,
                    help="prompt rows per teacher-forced dispatch (bounds "
                         "the [chunk, seq, vocab] logits buffer)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import dataclasses
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from easyrag_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from easyrag_tpu.models.decode import _lm_logits, generate_greedy
    from easyrag_tpu.models.hf_loader import (
        quantize_linear_int4_device,
        quantize_linear_int8_device,
    )
    from easyrag_tpu.models.layers import (
        DecoderConfig,
        forward_hidden,
        init_params,
    )

    arch = SCALES[args.scale]
    base_cfg = DecoderConfig(
        dtype=jnp.bfloat16,
        use_flash=jax.default_backend() != "cpu",
        attention_bias=True, rope_theta=1e6,
        **arch,
    )
    print(f"backend={jax.default_backend()} scale={args.scale} "
          f"prompts={args.prompts}x{args.seq} new={args.new}", flush=True)

    # bf16 master weights, built on device in one dispatch (tunnel lesson:
    # per-leaf uploads pay ~30 ms RTT each — tools/bench_decode.py)
    def build_bf16(key):
        p = init_params(base_cfg, key)
        p["lm_head"] = {"w": jax.random.normal(
            jax.random.fold_in(key, 7),
            (base_cfg.vocab_size, base_cfg.hidden_size), base_cfg.dtype,
        ) * 0.02}
        return p

    master = jax.jit(build_bf16)(jax.random.key(0))
    jax.block_until_ready(jax.tree.leaves(master)[0])

    def quantize_tree(params, qdev):
        """Requantize the SAME master weights the way hf_loader does."""
        out = {k: v for k, v in params.items()}
        out["lm_head"] = qdev(params["lm_head"]["w"])
        layers = []
        for layer in params["layers"]:
            nl = {k: v for k, v in layer.items()}
            for group in ("attn", "mlp"):
                ng = {}
                for name, lin in layer[group].items():
                    rest = {k: v for k, v in lin.items() if k != "w"}
                    ng[name] = {**qdev(lin["w"]), **rest}
                nl[group] = ng
            layers.append(nl)
        out["layers"] = layers
        return out

    rng = jax.random.key(1)
    ids = jax.random.randint(
        rng, (args.prompts, args.seq), 0, base_cfg.vocab_size, jnp.int32
    )
    mask_full = jnp.ones_like(ids)
    eos = jnp.asarray([-1], jnp.int32)

    def teacher_stats(cfg):
        """[prompts, seq] argmax + top-5 ids under ``cfg``'s quant flags,
        computed chunk rows at a time to bound the logits buffer."""
        @jax.jit
        def tf_chunk(params, ids_c):
            h = forward_hidden(cfg, params, ids_c, jnp.ones_like(ids_c))
            logits = _lm_logits(cfg, params, h.reshape(-1, h.shape[-1]))
            top5 = jax.lax.top_k(logits, 5)[1]
            return top5.reshape(ids_c.shape[0], ids_c.shape[1], 5)

        def run(params):
            outs = []
            for i in range(0, args.prompts, args.chunk):
                outs.append(np.asarray(tf_chunk(params, ids[i:i + args.chunk])))
            return np.concatenate(outs, 0)  # [P, S, 5]

        return run

    results = {"scale": args.scale, "prompts": args.prompts,
               "seq": args.seq, "new": args.new, "quants": {}}

    bf16_run = teacher_stats(base_cfg)
    t0 = time.perf_counter()
    ref_top5 = bf16_run(master)
    ref_gen = np.asarray(
        generate_greedy(base_cfg, master, ids, mask_full, eos, args.new)
    )
    print(f"bf16 reference done in {time.perf_counter() - t0:.0f}s",
          flush=True)

    qdevs = {"int8": quantize_linear_int8_device,
             "w8a8": quantize_linear_int8_device,
             "int4": quantize_linear_int4_device,
             "w4a8": quantize_linear_int4_device}
    for quant in args.quants:
        cfg = base_cfg
        if quant in ("w8a8", "w4a8"):
            cfg = dataclasses.replace(cfg, act_quant=True)
        params = jax.jit(
            lambda p, q=qdevs[quant]: quantize_tree(p, q)
        )(master)
        jax.block_until_ready(jax.tree.leaves(params)[0])

        t0 = time.perf_counter()
        top5 = teacher_stats(cfg)(params)
        # teacher-forced agreement
        agree = float((top5[..., 0] == ref_top5[..., 0]).mean())
        overlap = float(np.mean([
            len(np.intersect1d(top5[p, s], ref_top5[p, s])) / 5.0
            for p in range(args.prompts)
            for s in range(0, args.seq, max(args.seq // 64, 1))
        ]))
        # where does bf16's argmax land under quant?
        ref1 = ref_top5[..., 0][..., None]  # [P, S, 1]
        in_top5 = float((top5 == ref1).any(-1).mean())

        # greedy stability: matched prefix + overall match
        gen = np.asarray(
            generate_greedy(cfg, params, ids, mask_full, eos, args.new)
        )
        n_cmp = min(gen.shape[1], ref_gen.shape[1])
        eqs = gen[:, :n_cmp] == ref_gen[:, :n_cmp]
        prefix = float(np.mean([
            int(np.argmin(e)) if not e.all() else n_cmp for e in eqs
        ]))
        match = float(eqs.mean())

        results["quants"][quant] = {
            "teacher_forced_argmax_agreement": round(agree, 4),
            "bf16_argmax_in_quant_top5": round(in_top5, 4),
            "top5_overlap": round(overlap, 4),
            "greedy_mean_matched_prefix": round(prefix, 2),
            "greedy_token_match_rate": round(match, 4),
        }
        print(f"{quant}: tf-agree {agree:.1%}  top5-overlap {overlap:.1%}  "
              f"greedy prefix {prefix:.1f}/{args.new} "
              f"match {match:.1%}  ({time.perf_counter() - t0:.0f}s)",
              flush=True)

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
