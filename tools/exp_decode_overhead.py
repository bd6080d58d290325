"""Decompose the B=1 int4 decode step: where do 6.22 ms go vs the ~3.9 ms
weight-read roofline? (VERDICT r4 #7 / ROADMAP "B=1 gap" entry.)

``tools/bench_decode.py`` measures the PRODUCT number — generate_greedy's
while_loop, (t(1+N)-t(1))/N. This probe measures the step's components on
the same chip at the same shapes, each as a scan-chained jit (CHAIN
iterations per dispatch; float() readback is the tunnel-safe barrier,
tools/bench_layer_parts.py pattern):

  matvecs   just the 7 int4 matvecs/layer x 28 + nothing else
  +lm_head  the [152064, 3584] head matvec alone
  step      the full decode-step body (embed, norms, rope, cache write,
            attention against the T-slot cache, matvecs, head, argmax)
            scan-chained with the cache as carry — the while_loop's body
            without the while_loop
  loop      generate_greedy itself (the product measurement, for the same
            session's reference point)

step - (matvecs + lm_head)   = attention/cache/norm/glue cost
loop - step                  = while_loop bookkeeping + done/EOS logic

Run: python tools/exp_decode_overhead.py [--quant int4] [--chain 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4", choices=["int8", "int4"])
    ap.add_argument("--prompt", type=int, default=1024)
    ap.add_argument("--new", type=int, default=16)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import json

    import jax
    import jax.numpy as jnp

    from easyrag_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from easyrag_tpu.models.decode import (
        _decode_layer,
        _lm_logits,
        _prefill,
        generate_greedy,
        init_cache,
    )
    from easyrag_tpu.models.hf_loader import (
        quantize_linear_int4_device,
        quantize_linear_int8_device,
    )
    from easyrag_tpu.models.layers import (
        DecoderConfig,
        _linear,
        embed,
        init_params,
        rms_norm,
        rope_tables,
    )

    cfg = DecoderConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        attention_bias=True, rope_theta=1e6,
        dtype=jnp.bfloat16, use_flash=jax.default_backend() != "cpu",
    )
    qdev = (quantize_linear_int4_device if args.quant == "int4"
            else quantize_linear_int8_device)

    def build(key):
        p = init_params(cfg, key)
        head = jax.random.normal(
            jax.random.fold_in(key, 7), (cfg.vocab_size, cfg.hidden_size),
            cfg.dtype,
        ) * 0.02
        p["lm_head"] = qdev(head)
        for layer in p["layers"]:
            for group in ("attn", "mlp"):
                for name, lin in list(layer[group].items()):
                    rest = {k: v for k, v in lin.items() if k != "w"}
                    layer[group][name] = {**qdev(lin["w"]), **rest}
        return p

    params = jax.jit(build)(jax.random.key(0))
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"backend={jax.default_backend()} quant={args.quant} "
          f"params={nbytes / 2**30:.2f} GiB chain={args.chain}", flush=True)

    B, S, N, CHAIN = 1, args.prompt, args.new, args.chain
    T = S + N
    rng = jax.random.key(1)
    ids = jax.random.randint(rng, (B, S), 0, cfg.vocab_size, jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    eos = jnp.asarray([-1], jnp.int32)

    # fixed dispatch + scalar-readback cost of ONE timed call (the tunnel
    # RTT, ~30 ms on this attachment) — subtracted so per-chain numbers
    # reflect device time, matching how the loop row is measured
    # ((t(1+N)-t(1))/N cancels its RTT by construction).
    null = jax.jit(lambda x: jnp.sum(x))
    xnull = jnp.ones((8,), jnp.float32)
    float(null(xnull))
    rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(null(xnull))
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"null dispatch+readback: {rtt * 1000:.2f} ms", flush=True)

    def timeit(name, f, fargs, per_chain=True):
        float(f(*fargs))  # compile + sync (axon ignores block_until_ready)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(f(*fargs))
            best = min(best, time.perf_counter() - t0)
        per = max(best - rtt, 0.0) / CHAIN if per_chain else best
        print(f"{name}: {per * 1000:.2f} ms", flush=True)
        return per * 1000

    res = {"quant": args.quant, "prompt": S, "chain": CHAIN,
           "rtt_ms": round(rtt * 1000, 2)}

    # ---- matvecs only: the 7 projections x 28 layers, no attention ------
    @jax.jit
    def matvecs(p, x0):
        def layer_mm(x, lp):
            a, m = lp["attn"], lp["mlp"]
            q = _linear(x, a["q"])
            k = _linear(x, a["k"])
            v = _linear(x, a["v"])
            o = _linear(q.reshape(1, -1), a["o"])
            g = _linear(x, m["gate"])
            u = _linear(x, m["up"])
            d = _linear(jax.nn.silu(g) * u, m["down"])
            # fold k/v so nothing is dead-code-eliminated
            return (o + d + jnp.sum(k) + jnp.sum(v)).astype(x.dtype), None

        def chain_body(x, _):
            # unrolled over layers, exactly like the real decode step —
            # a scan over stacked weights would HBM-copy each layer's
            # slice per iteration (measured: 12.1 vs 5.6 ms/step, a pure
            # artifact) and take a different _linear code path.
            for lp in p["layers"]:
                x, _ = layer_mm(x, lp)
            return x, None

        x, _ = jax.lax.scan(chain_body, x0, None, length=CHAIN)
        return jnp.sum(x)

    x0 = jnp.ones((1, cfg.hidden_size), cfg.dtype) * 0.01
    res["matvecs_ms"] = timeit("matvecs (7x28, no attn)", matvecs, (params, x0))

    # ---- lm_head alone ----------------------------------------------------
    @jax.jit
    def lm_head_only(p, x0):
        def body(x, _):
            l = _lm_logits(cfg, p, x)
            # feed a scalar back through x so steps serialize
            return x + (l[0, 0] * 1e-12).astype(x.dtype), None

        x, _ = jax.lax.scan(body, x0, None, length=CHAIN)
        return jnp.sum(x)

    res["lm_head_ms"] = timeit("lm_head (152k x 3584)", lm_head_only,
                               (params, x0))

    # ---- full decode-step body, scan-chained (no while_loop) -------------
    cache0 = init_cache(cfg, B, T)
    h_last, cache0 = jax.jit(
        lambda p, i, m, c: _prefill(cfg, p, i, m, c)
    )(params, ids, mask, cache0)
    kv_mask0 = jnp.concatenate(
        [mask, jnp.zeros((B, N), jnp.int32)], axis=1)

    @jax.jit
    def step_chain(p, tok0, cache, kv_mask):
        def body(carry, step):
            tok, cache, kv_mask = carry
            pos = S + step
            kv_mask = jax.lax.dynamic_update_slice(
                kv_mask, jnp.ones((B, 1), jnp.int32), (0, pos))
            rope_pos = (jnp.full((B,), S, jnp.int32) + step)[:, None]
            cos, sin = rope_tables(rope_pos, cfg.hd, cfg.rope_theta)
            h = embed(cfg, p, tok[:, None])
            new_cache = []
            for idx in range(cfg.num_hidden_layers):
                h, c = _decode_layer(
                    cfg, p["layers"][idx], h, pos, kv_mask, cos, sin,
                    cache[idx])
                new_cache.append(c)
            h = rms_norm(h, p["final_norm"], cfg.rms_norm_eps, cfg.gemma)
            nxt = jnp.argmax(
                _lm_logits(cfg, p, h[:, 0]), axis=-1).astype(jnp.int32)
            return (nxt, new_cache, kv_mask), None

        # NOTE: steps > N would overrun the cache; CHAIN <= N enforced below
        (tok, cache, kv_mask), _ = jax.lax.scan(
            body, (tok0, cache, kv_mask), jnp.arange(CHAIN, dtype=jnp.int32))
        return jnp.sum(tok)

    assert CHAIN <= N, "--chain must be <= --new (cache slots)"
    tok0 = jnp.argmax(_lm_logits(cfg, params, h_last), axis=-1).astype(jnp.int32)
    res["step_ms"] = timeit(
        "full step (scan, no while_loop)", step_chain,
        (params, tok0, cache0, kv_mask0))

    # ---- the product path: generate_greedy's while_loop -------------------
    def loop_run(max_new):
        out = generate_greedy(cfg, params, ids, mask, eos, max_new)
        return float(jnp.sum(out))

    loop_run(1)
    loop_run(1 + N)
    best1 = best_n = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        loop_run(1)
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        loop_run(1 + N)
        best_n = min(best_n, time.perf_counter() - t0)
    res["loop_ms"] = (best_n - best1) / N * 1000
    print(f"generate_greedy while_loop: {res['loop_ms']:.2f} ms/step",
          flush=True)

    res["attn_cache_norm_glue_ms"] = round(
        res["step_ms"] - res["matvecs_ms"] - res["lm_head_ms"], 2)
    res["while_loop_overhead_ms"] = round(res["loop_ms"] - res["step_ms"], 2)
    for k in ("matvecs_ms", "lm_head_ms", "step_ms", "loop_ms"):
        res[k] = round(res[k], 2)
    print(f"decomposition: matvecs {res['matvecs_ms']} + lm_head "
          f"{res['lm_head_ms']} + attn/cache/glue "
          f"{res['attn_cache_norm_glue_ms']} + while_loop "
          f"{res['while_loop_overhead_ms']} = {res['loop_ms']} ms", flush=True)
    if args.json:
        print(json.dumps(res))


if __name__ == "__main__":
    main()
