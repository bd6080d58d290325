"""Whole-system co-resident benchmark: the reference's actual unit of value
— ``run(query)`` end to end — with every serving component loaded on ONE
chip simultaneously, the reference's deployment shape (one 16 GB GPU,
``/root/reference/README.md:27``; run path
``src/easyrag/pipeline/pipeline.py:323-345``).

Co-resident HBM tenants (all at true architecture scale, random weights
generated ON DEVICE — uploads crawl through the axon tunnel; timing is
identical to real weights):

* gte-Qwen2-7B embedder, int8 weight-only matmuls + full-vocab bf16 embed
  table (~7.6 GB)
* bge-reranker-v2-minicpm-layerwise at true depth (40 layers, bf16,
  ~5.5 GB incl. the 122k-vocab embed table); the default route runs
  layers [0, 28) (``cutoff_layers=[28]``, ``rerankers.py:162``)
* resident sparse content index (top-192) + know-path index (top-6) over a
  20k-chunk synthetic corpus booted through the REAL ``EasyRAGPipeline``
* dense cosine index 20k x 3584 bf16 (the qdrant replacement; resident for
  route servability even though the default route is sparse)

Measured:
1. HBM occupancy with everything loaded (the co-residency proof)
2. full ``run(query)`` p50/p95 — sparse dual route -> fusion(<=198) ->
   rerank in 32-pair batches at cutoff 28 -> top-6 context -> stubbed
   generation
3. the same with early exit (``r_use_efficient=1``): exit-taken (judge
   fires at layer 12) and exit-declined (two-segment protocol overhead)
4. retrieval-only batch qps co-resident (does model pressure slow the
   stream scorers?)
5. dense route INCLUDING query embedding: short-query (S=64) batch through
   the int8 7B embedder -> fused cosine top-288 (VERDICT r2 item #3)

Run: python tools/bench_pipeline.py [--docs 20000] [--queries 5]
     [--skip-embedder] [--tiny]
"""

import argparse
import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/easyrag_pipe_bench"


class CharTokenizer:
    """Deterministic 1-char-per-token tokenizer for driving the reranker at
    its real sequence shape without a checkpoint vocabulary. Host-side
    tokenization cost is negligible either way; what the benchmark must get
    right is the TOKEN COUNT per pair, which this pins exactly."""

    bos_token_id = 1
    pad_token_id = 0
    padding_side = "right"  # the shipped checkpoint declares right padding

    def __init__(self, vocab: int) -> None:
        self.vocab = vocab

    def __call__(self, text, add_special_tokens=False, max_length=None, truncation=False):
        ids = [(hash(ch) % (self.vocab - 2)) + 2 for ch in text]
        if max_length is not None and truncation:
            ids = ids[:max_length]
        return {"input_ids": ids}


class StubLLM:
    """Generation stub: instant canned answer (the reference's generation is
    a network call to GLM-4 — out of scope for on-chip measurement)."""

    async def acomplete(self, prompt: str):
        from easyrag_tpu.generation import CompletionResponse

        return CompletionResponse(text="无法确定")


class LocalGenLLM:
    """REAL on-chip generation at Qwen2-7B-Instruct scale: the QA prompt is
    tokenized 1-char-per-token (pins the honest token count; Chinese is
    ~1 char/token under the real Qwen2 vocab), left-padded to a 128-multiple
    bucket, and greedy-decoded ``max_new`` steps through the KV-cache loop
    (``models/decode.py``). EOS is a sentinel that never fires, so every
    answer pays the full ``max_new`` decode cost (worst case; real answers
    stop at EOS and cost less)."""

    def __init__(self, cfg, params, max_new=128,
                 buckets=(2048, 4096, 7680), max_batch=8) -> None:
        self.cfg, self.params = cfg, params
        self.max_new = max_new
        self.buckets = buckets
        self.max_batch = max_batch  # decode rows per dispatch (gen_batch)
        self.prompt_tokens = 0  # last call, for reporting
        # the DecodePool surface (models/decode_pool.py), so the serving
        # bench can drive continuous batching at true scale
        self.max_new_tokens = max_new
        self.eos_ids = [-1]  # sentinel: never fires, every row pays max_new

        class _Tok:
            pad_token_id = 0

        self.tokenizer = _Tok()

    def _encode(self, prompt: str):
        ids = [(hash(c) % (self.cfg.vocab_size - 2)) + 2 for c in prompt]
        self.prompt_tokens = len(ids[-self.buckets[-1]:])
        return ids[-self.buckets[-1]:]

    def _decode_row(self, toks):
        return f"[{self.max_new} tokens decoded on-chip]"

    async def acomplete(self, prompt: str):
        import asyncio

        # keep the event loop responsive while the chip decodes (seconds):
        # serving handlers must still accept/queue concurrent requests
        return await asyncio.to_thread(self._complete, prompt)

    def _complete(self, prompt: str):
        from easyrag_tpu.generation import CompletionResponse

        return CompletionResponse(text=self.generate_batch([prompt])[0])

    def generate_batch(self, prompts):
        """Batched decode, same grouping scheme as JaxCausalLM.generate_batch
        (bucket groups, batch dim padded to a pow2 with active-masked dummy
        rows) — lets the serving bench drive generation.BatchingLocalLLM's
        cross-request coalescing at true 7B scale."""
        import jax.numpy as jnp

        from easyrag_tpu.models.decode import generate_greedy

        encs, groups = [], {}
        for i, prompt in enumerate(prompts):
            ids = self._encode(prompt)
            encs.append(ids)
            bucket = next(b for b in self.buckets if len(ids) <= b)
            groups.setdefault(bucket, []).append(i)
        for bucket, bidxs in groups.items():
            for lo in range(0, len(bidxs), self.max_batch):
                idxs = bidxs[lo : lo + self.max_batch]
                b = 1 << (len(idxs) - 1).bit_length()
                rows = [[0] * (bucket - len(encs[i])) + encs[i] for i in idxs]
                masks = [
                    [0] * (bucket - len(encs[i])) + [1] * len(encs[i])
                    for i in idxs
                ]
                rows += [[0] * bucket] * (b - len(idxs))
                masks += [[0] * (bucket - 1) + [1]] * (b - len(idxs))
                out = generate_greedy(
                    self.cfg,
                    self.params,
                    jnp.asarray(rows, jnp.int32),
                    jnp.asarray(masks, jnp.int32),
                    jnp.asarray([-1], jnp.int32),  # sentinel: all steps run
                    self.max_new,
                    limit=jnp.int32(self.max_new),
                    active=jnp.arange(b) < len(idxs),
                )
                int(out.sum())  # device->host scalar readback barrier
        return [f"[{self.max_new} tokens decoded on-chip]"] * len(prompts)

    def plan_groups(self, prompts):
        """The exact (bucket, padded-B) executables ``generate_batch``
        would dispatch for these prompts, without running any of them —
        lets the bench warm ONLY the pairs its recorded workload hits
        (each warm big-graph load costs ~a minute through the axon
        tunnel even on a persistent-cache hit, so full-coverage warmup
        is the driver bench's budget eater)."""
        groups = {}
        for prompt in prompts:
            n = len(self._encode(prompt))
            bucket = next(b for b in self.buckets if n <= b)
            groups.setdefault(bucket, []).append(n)
        pairs = set()
        for bucket, rows in groups.items():
            for lo in range(0, len(rows), self.max_batch):
                chunk = len(rows[lo : lo + self.max_batch])
                pairs.add((bucket, 1 << (chunk - 1).bit_length()))
        return sorted(pairs)

    def warmup(self, batch_sizes=(1,), buckets=None, pairs=None):
        """Pre-compile (bucket, B) executables (limit=1: full-length
        static shapes, one decode step) — the tpu.local_llm_warmup boot
        behavior at bench scale. ``pairs`` warms an exact recorded set
        (see ``plan_groups``); otherwise every bucket x batch_size is
        covered. Warming only the largest bucket measured as a 718 s
        p95: prompt lengths depend on retrieved contexts, so timed
        queries land in other buckets."""
        import jax.numpy as jnp

        from easyrag_tpu.models.decode import generate_greedy

        if pairs is None:
            pairs = [(bucket, b) for bucket in (buckets or self.buckets)
                     for b in batch_sizes]
        for bucket, b in pairs:
            out = generate_greedy(
                self.cfg,
                self.params,
                jnp.asarray([[0] * (bucket - 1) + [1]] * b, jnp.int32),
                jnp.asarray([[0] * (bucket - 1) + [1]] * b, jnp.int32),
                jnp.asarray([-1], jnp.int32),
                self.max_new,
                limit=jnp.int32(1),
                active=jnp.arange(b) < b,
            )
            int(out.sum())


def make_local_llm(max_new: int, tiny: bool = False, quant: str = "int8"):
    """Random Qwen2-7B-Instruct-architecture weights on device, plus an
    untied quantized lm_head (the 7B-Instruct layout). ``quant="int4"``
    packs the matmul weights to nibbles + stores the embed table int8
    (hf_loader's int4 layout, ~4.3 vs 7.6 GiB) — the four-tenant
    co-residency configuration."""
    import jax
    import jax.numpy as jnp

    from easyrag_tpu.models.layers import DecoderConfig

    arch = dict(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        attention_bias=True, rope_theta=1e6,
    )
    if tiny:
        arch = dict(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, attention_bias=True,
        )
    cfg = DecoderConfig(
        dtype=jnp.bfloat16, use_flash=jax.default_backend() != "cpu", **arch
    )
    if quant == "int4":
        from easyrag_tpu.models.hf_loader import fuse_decode_tree

        params = jax.jit(_llm_tree_int4, static_argnums=0)(cfg, jax.random.key(31))
        # production layout (JaxCausalLM does the same): fused q+k+v /
        # gate+up packed matvecs — 196 -> 112 dispatches per decode step
        params = fuse_decode_tree(params)
    else:
        params = make_embedder_params_int8(cfg, jax.random.key(31))

        @jax.jit
        def head(key):
            w_q = jax.random.randint(
                key, (cfg.vocab_size, cfg.hidden_size), -127, 128, jnp.int32
            ).astype(jnp.int8)
            return {"w_q": w_q,
                    "scale": jnp.full((cfg.vocab_size,), 0.02 / 73.0, jnp.float32)}

        params["lm_head"] = head(jax.random.key(32))
    buckets = (64, 128) if tiny else (2048, 4096, 7680)
    return LocalGenLLM(cfg, params, max_new=max_new, buckets=buckets)


def _llm_tree_int4(cfg, key):
    """Random int4-leaf LLM tree in hf_loader's quant='int4' layout:
    nibble-packed matmuls + int4 head + int8 embed table, one dispatch."""
    import jax
    import jax.numpy as jnp

    def q4(key, n_in, n_out, bias=False):
        w_p = jax.random.randint(
            key, (n_out, n_in // 2), -128, 128, jnp.int32
        ).astype(jnp.int8)  # random bytes = two uniform nibbles
        p = {"w_p": w_p, "scale": jnp.full((n_out,), 0.02 / 4.0, jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((n_out,), cfg.dtype)
        return p

    d, hd = cfg.hidden_size, cfg.hd
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    layers = []
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[i], 8)
        layers.append(
            {
                "input_norm": jnp.ones((d,), cfg.dtype),
                "post_norm": jnp.ones((d,), cfg.dtype),
                "attn": {
                    "q": q4(k[0], d, cfg.num_attention_heads * hd, cfg.attention_bias),
                    "k": q4(k[1], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                    "v": q4(k[2], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                    "o": q4(k[3], cfg.num_attention_heads * hd, d),
                },
                "mlp": {
                    "gate": q4(k[4], d, cfg.intermediate_size),
                    "up": q4(k[5], d, cfg.intermediate_size),
                    "down": q4(k[6], cfg.intermediate_size, d),
                },
            }
        )
    embed_q = jax.random.randint(
        keys[-2], (cfg.vocab_size, d), -127, 128, jnp.int32
    ).astype(jnp.int8)
    return {
        "embed": {"w_q": embed_q,
                  "scale": jnp.full((cfg.vocab_size,), 0.02 / 73.0, jnp.float32)},
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": q4(keys[-1], d, cfg.vocab_size),
    }


def build_corpus_on_disk(root: str, n_docs: int, rng) -> None:
    """Synthetic corpus shaped like the zedx chunk set (~300 tokens/doc,
    Zipfian 40k vocab), written as one-chunk .txt files the real ingestion
    layer reads. Cached across runs."""
    marker = os.path.join(root, f".done_{n_docs}")
    if os.path.exists(marker):
        return
    import shutil

    if os.path.exists(root):
        shutil.rmtree(root)
    zipf = 1.0 / np.arange(1, 40_000 + 1)
    zipf /= zipf.sum()
    dirs = ["director", "emsplus", "rcp", "umac"]
    pathmap = {}
    docs_per_file = 10  # 10 chunks per file keeps the file count sane
    n_files = (n_docs + docs_per_file - 1) // docs_per_file
    for f in range(n_files):
        d = dirs[f % 4]
        os.makedirs(os.path.join(root, d), exist_ok=True)
        parts = []
        for c in range(docs_per_file):
            length = max(30, int(rng.poisson(300)))
            toks = rng.choice(40_000, size=length, p=zipf)
            parts.append(" ".join(f"t{t}" for t in toks))
        # \n\n\n is the splitter's paragraph separator: each part becomes
        # its own chunk (300 "words" < chunk_size)
        body = f"文档{f}\n" + "\n\n\n".join(parts)
        rel = os.path.join(d, f"doc{f}.txt")
        with open(os.path.join(root, rel), "w", encoding="utf-8") as fh:
            fh.write(body)
        pathmap[rel] = ["知识", d, f"doc{f}"]
    with open(os.path.join(root, "pathmap.json"), "w", encoding="utf-8") as fh:
        json.dump(pathmap, fh)
    open(marker, "w").close()


def make_embedder_params_int8(cfg, key):
    """Random int8 weight-only 7B params generated directly on device — the
    exact leaf layout ``hf_loader.quantize_linear_int8`` produces, without
    ever materializing the 14 GB bf16 tree. ONE jitted dispatch for the
    whole tree: per-leaf dispatches each pay the tunnel round trip (~200
    of them took >10 min under load)."""
    import jax

    return jax.jit(_embedder_tree_int8, static_argnums=0)(cfg, key)


def _embedder_tree_int8(cfg, key):
    import jax
    import jax.numpy as jnp

    def q8(key, n_in, n_out, bias):
        kw, = jax.random.split(key, 1)
        w_q = jax.random.randint(kw, (n_out, n_in), -127, 128, jnp.int32).astype(jnp.int8)
        # scale ~= 0.02 / std(uniform +-127): realistic weight magnitudes
        p = {"w_q": w_q, "scale": jnp.full((n_out,), 0.02 / 73.0, jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((n_out,), cfg.dtype)
        return p

    d, hd = cfg.hidden_size, cfg.hd
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    layers = []
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[i], 8)
        layers.append(
            {
                "input_norm": jnp.ones((d,), cfg.dtype),
                "post_norm": jnp.ones((d,), cfg.dtype),
                "attn": {
                    "q": q8(k[0], d, cfg.num_attention_heads * hd, cfg.attention_bias),
                    "k": q8(k[1], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                    "v": q8(k[2], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                    "o": q8(k[3], cfg.num_attention_heads * hd, d, False),
                },
                "mlp": {
                    "gate": q8(k[4], d, cfg.intermediate_size, False),
                    "up": q8(k[5], d, cfg.intermediate_size, False),
                    "down": q8(k[6], cfg.intermediate_size, d, False),
                },
            }
        )
    return {
        "embed": jax.random.normal(keys[-2], (cfg.vocab_size, d), cfg.dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
    }


def make_embedder_params_int4(cfg, key):
    """int4 twin of :func:`make_embedder_params_int8` (nibble-packed
    matmuls + int8 embed table — hf_loader's quant='int4' embedder layout,
    ~3.8 vs 7.1 GiB at 7B): the four-tenant co-residency embedder."""
    import jax

    return jax.jit(_embedder_tree_int4, static_argnums=0)(cfg, key)


def _embedder_tree_int4(cfg, key):
    import jax
    import jax.numpy as jnp

    def q4(key, n_in, n_out, bias):
        w_p = jax.random.randint(
            key, (n_out, n_in // 2), -128, 128, jnp.int32
        ).astype(jnp.int8)  # random bytes = two uniform nibbles
        p = {"w_p": w_p, "scale": jnp.full((n_out,), 0.02 / 4.0, jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((n_out,), cfg.dtype)
        return p

    d, hd = cfg.hidden_size, cfg.hd
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    layers = []
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[i], 8)
        layers.append(
            {
                "input_norm": jnp.ones((d,), cfg.dtype),
                "post_norm": jnp.ones((d,), cfg.dtype),
                "attn": {
                    "q": q4(k[0], d, cfg.num_attention_heads * hd, cfg.attention_bias),
                    "k": q4(k[1], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                    "v": q4(k[2], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                    "o": q4(k[3], cfg.num_attention_heads * hd, d, False),
                },
                "mlp": {
                    "gate": q4(k[4], d, cfg.intermediate_size, False),
                    "up": q4(k[5], d, cfg.intermediate_size, False),
                    "down": q4(k[6], cfg.intermediate_size, d, False),
                },
            }
        )
    embed_q = jax.random.randint(
        keys[-2], (cfg.vocab_size, d), -127, 128, jnp.int32
    ).astype(jnp.int8)
    return {
        "embed": {"w_q": embed_q,
                  "scale": jnp.full((cfg.vocab_size,), 0.02 / 73.0, jnp.float32)},
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
    }


_ACCOUNTED = {}  # tag -> bytes of arrays we allocated (axon has no memory_stats)


def account(tag: str, tree) -> None:
    import jax

    _ACCOUNTED[tag] = sum(
        x.nbytes for x in jax.tree.leaves(tree) if isinstance(x, jax.Array)
    )


def hbm_stats(tag: str):
    """Device-reported occupancy when the backend supports it; otherwise the
    explicit allocation ledger (parameter/index arrays we device_put) — an
    UNDERcount (excludes XLA temporaries) but an honest residency floor."""
    import jax

    dev = jax.devices()[0]
    stats = None
    try:
        stats = dev.memory_stats()
    except Exception:
        pass
    if stats:
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        print(f"[hbm] {tag}: {used/2**30:.2f} GiB in use"
              + (f" / {limit/2**30:.2f} GiB" if limit else ""), flush=True)
        return used
    used = sum(_ACCOUNTED.values())
    detail = ", ".join(f"{k} {v/2**30:.2f}" for k, v in _ACCOUNTED.items())
    print(f"[hbm] {tag}: >= {used/2**30:.2f} GiB accounted ({detail}) "
          f"[backend reports no memory_stats]", flush=True)
    return used


def build_system(
    tiny: bool = False, docs: int = 20_000, with_embedder: bool = True,
    rr_quant: str = "", em_quant: str = "int8",
):
    """Boot the full co-resident system (corpus -> real pipeline + reranker
    at true scale + int8 7B embedder + dense index). Returns a namespace
    shared by this benchmark and ``tools/bench_serving.py``.

    ``rr_quant="w8a8"`` boots the reranker with int8 weights + dynamic
    activation quant (``layers.DecoderConfig.act_quant``) — the 2x-MXU-rate
    opt-in; also halves the reranker's HBM (5.1 -> ~2.8 GiB)."""
    from types import SimpleNamespace

    from easyrag_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # 7B graph compiles cost 10+ min on the tunnel

    import jax
    import jax.numpy as jnp

    from bench import RERANKER_2B
    from easyrag_tpu.config import EasyRAGConfig, TPUConfig
    from easyrag_tpu.index.dense import DenseIndex
    from easyrag_tpu.models.layers import DecoderConfig, init_params
    from easyrag_tpu.models.minicpm import MiniCPMLayerWiseReranker
    from easyrag_tpu.pipeline import EasyRAGPipeline
    from easyrag_tpu.rerankers import LLMRerank

    rng = np.random.default_rng(0)
    t_setup = time.perf_counter()

    # ---- corpus + pipeline boot (real ingestion + resident sparse) --------
    n_docs = 200 if tiny else docs
    corpus_dir = os.path.join(CACHE, f"corpus_{n_docs}")
    build_corpus_on_disk(corpus_dir, n_docs, rng)

    # ---- reranker at true scale ------------------------------------------
    if tiny:
        rr_arch = dict(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_attention_heads=2, num_key_value_heads=2,
            scale_emb=12.0, scale_depth=1.4, dim_model_base=64.0,
        )
        rr_layers, rr_cutoff, judge_layer = 4, 3, 2
    else:
        # true checkpoint shape: 40 layers, 122k vocab (the default route
        # reads the layer-28 head; full depth is resident as deployed)
        rr_arch = dict(RERANKER_2B, vocab_size=122_753)
        rr_layers, rr_cutoff, judge_layer = 40, 28, 12
    rr_cfg = DecoderConfig(
        num_hidden_layers=rr_layers,
        use_flash=jax.default_backend() != "cpu",
        dtype=jnp.bfloat16,
        **rr_arch,
    )
    # one dispatch for the whole tree (per-leaf dispatches pay the tunnel
    # round trip each; init_params is fully traceable)
    rr_params = jax.jit(init_params, static_argnums=0)(rr_cfg, jax.random.key(0))
    if rr_quant == "w8a8":
        import dataclasses

        rr_cfg = dataclasses.replace(rr_cfg, act_quant=True)

        from easyrag_tpu.models.hf_loader import quantize_linear_int8_device

        # production quant semantics, on device (donate frees the bf16 copy)
        q8 = jax.jit(quantize_linear_int8_device, donate_argnums=0)
        for layer in rr_params["layers"]:
            for group in ("attn", "mlp"):
                for name in list(layer[group]):
                    rest = dict(layer[group][name])
                    rest.pop("w")
                    layer[group][name] = {
                        **q8(layer[group][name]["w"]), **rest,
                    }
    rr_params["heads"] = {
        layer: jax.random.normal(jax.random.fold_in(jax.random.key(2), layer),
                                 (1, rr_cfg.hidden_size), jnp.float32) * 0.02
        for layer in range(8 if not tiny else 1, rr_layers + 1)
    }
    scorer = MiniCPMLayerWiseReranker(
        rr_cfg, rr_params, CharTokenizer(rr_arch["vocab_size"]),
        start_layer=8 if not tiny else 1,
        cutoff_layer=rr_cutoff,
        efficient_layers=(judge_layer,),
        use_efficient=0,
        max_length=1024,
    )
    reranker = LLMRerank(scorer, top_n=6, embed_bs=32, embed_type=0)
    account("reranker", rr_params)
    hbm_stats("reranker loaded")

    # ---- embedder at true scale (int8) -----------------------------------
    embed_params = None
    if with_embedder:
        if tiny:
            em_arch = dict(hidden_size=128, intermediate_size=256,
                           num_hidden_layers=2, num_attention_heads=2,
                           num_key_value_heads=1, vocab_size=512)
        else:
            em_arch = dict(hidden_size=3584, intermediate_size=18944,
                           num_hidden_layers=28, num_attention_heads=28,
                           num_key_value_heads=4, vocab_size=151_643)
        em_cfg = DecoderConfig(
            attention_bias=True, use_flash=jax.default_backend() != "cpu",
            dtype=jnp.bfloat16, **em_arch,
        )
        if em_quant == "int4":
            # nibble-packed matmuls + int8 embed table (~3.8 vs 7.1 GiB):
            # the four-tenant co-residency embedder
            embed_params = make_embedder_params_int4(em_cfg, jax.random.key(7))
        else:
            embed_params = make_embedder_params_int8(em_cfg, jax.random.key(7))
        account("embedder", embed_params)
        hbm_stats("embedder loaded")

    # ---- dense index (route servability; generated on device) ------------
    dvec = 128 if tiny else 3584  # = embedder hidden (route composability)
    dmat = jax.random.normal(jax.random.key(9), (n_docs, dvec), jnp.bfloat16)
    dmat = dmat / jnp.linalg.norm(dmat.astype(jnp.float32), axis=1, keepdims=True).astype(jnp.bfloat16)
    dense_index = DenseIndex(matrix=dmat)
    account("dense_index", {"m": dmat})
    hbm_stats("dense index loaded")

    # ---- boot the real pipeline over the corpus --------------------------
    cfg = EasyRAGConfig(
        re_only=False,
        retrieval_type=2,
        use_reranker=2,
        data_path=corpus_dir,
        index_artifact_path=os.path.join(CACHE, f"artifact_{n_docs}"),
        # the splitter merges adjacent ~300-token parts up to chunk_size;
        # 384 keeps one part per chunk so the chunk count ≈ --docs and the
        # chunk-length distribution matches the zedx stats the component
        # benches use (the reference's 1024 would fuse 3 parts per chunk)
        chunk_size=384,
        chunk_overlap=0,
        f_topk_2=192 if not tiny else 16,
        f_topk_3=6 if not tiny else 2,
        r_topk=6,
        r_embed_bs=32,
        tpu=TPUConfig(use_pallas=False),
    )
    pipeline = EasyRAGPipeline(cfg, llm=StubLLM(), reranker=reranker)
    n_nodes = len(pipeline.nodes)
    print(f"[boot] {n_nodes} nodes in {time.perf_counter()-t_setup:.1f}s", flush=True)
    for name, retr in (("sparse_content", pipeline.sparse_retriever),
                       ("sparse_path", pipeline.path_retriever)):
        res = getattr(retr, "_resident", None)
        if res is not None:
            account(name, vars(res))
    used = hbm_stats("ALL CO-RESIDENT")

    return SimpleNamespace(
        pipeline=pipeline, scorer=scorer, reranker=reranker,
        em_cfg=em_cfg if with_embedder else None, embed_params=embed_params,
        dense_index=dense_index, n_nodes=n_nodes, hbm_used=used, rng=rng,
        tiny=tiny,
    )


def make_query(sys_ns):
    """A 12-term query sampled from real node contents (Zipf-head terms
    excluded, emulating stopword removal)."""
    rng, pipeline = sys_ns.rng, sys_ns.pipeline
    stop = {f"t{t}" for t in range(32)}
    node = pipeline.nodes[rng.integers(0, sys_ns.n_nodes)]
    toks = [t for t in node.get_content().split() if t not in stop][:400]
    take = rng.choice(len(toks), size=min(12, len(toks)), replace=False)
    return " ".join(toks[i] for i in take)


def apply_preset(args, argv=None) -> None:
    """Map a yaml config preset's knobs onto this tool's flags, so the
    flagship deployment is reproducible in one token
    (``--preset configs/four_tenant.yaml``). A flag the user passed
    explicitly on the command line wins over the preset."""
    import yaml

    with open(args.preset, encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    tpu = raw.get("tpu", {}) or {}
    explicit = set(sys.argv[1:] if argv is None else argv)

    def default_only(flag, value):
        if "--" + flag.replace("_", "-") not in explicit:
            setattr(args, flag, value)

    eq = tpu.get("embedder_quant", "")
    if eq == "w4a8":
        default_only("embedder_quant", "int4")
        default_only("embedder_w8a8", True)
    elif eq == "w8a8":
        default_only("embedder_quant", "int8")
        default_only("embedder_w8a8", True)
    elif eq:
        default_only("embedder_quant", eq)
    if tpu.get("reranker_quant") in ("w8a8",):
        default_only("reranker_quant", tpu["reranker_quant"])
    if raw.get("r_use_efficient") == 3:
        default_only("cascade", int(tpu.get("cascade_keep", 32)))
        default_only("cascade_carry", bool(tpu.get("cascade_carry", False)))
    if raw.get("local_llm_name") and tpu.get("local_llm_answer"):
        default_only("local_llm", int(tpu.get("local_llm_max_new", 128)))
        default_only("local_llm_quant", tpu.get("local_llm_quant", "int8"))
        default_only("gen_batch", int(tpu.get("local_llm_gen_batch", 8)))
    if tpu.get("compile_cache_dir"):
        os.environ.setdefault("EASYRAG_COMPILE_CACHE", tpu["compile_cache_dir"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=5)
    ap.add_argument("--retrieval-queries", type=int, default=512)
    ap.add_argument("--skip-embedder", action="store_true",
                    help="skip the 7B embedder (residency + dense route)")
    ap.add_argument("--skip-exit", action="store_true",
                    help="skip the early-exit p50 variants")
    ap.add_argument("--tiny", action="store_true",
                    help="toy scale: smoke-tests the tool itself (CPU-safe)")
    ap.add_argument("--reranker-quant", default="", choices=["", "w8a8"],
                    help="boot the reranker w8a8 (s8 x s8 projections)")
    ap.add_argument("--embedder-quant", default="int8",
                    choices=["int8", "int4"],
                    help="embedder weight storage; int4 (~3.8 GiB incl. "
                         "int8 embed table) is the four-tenant config")
    ap.add_argument("--embedder-w8a8", action="store_true",
                    help="run the (already int8-weight) embedder with "
                         "dynamic activation quant in the dense route")
    ap.add_argument("--local-llm", type=int, default=0, metavar="MAX_NEW",
                    help="also boot a 7B-Instruct-scale local LLM (on-chip "
                         "KV-cache decode) and time the full route with "
                         "REAL generation of MAX_NEW tokens")
    ap.add_argument("--local-llm-quant", default="int8",
                    choices=["int8", "int4"],
                    help="int4 (nibble-packed, ~4.3 GiB) co-fits with the "
                         "7B embedder: the FOUR-tenant boot; int8 needs "
                         "--skip-embedder")
    ap.add_argument("--answer-eval", type=int, default=0, metavar="N",
                    help="with --local-llm: time N queries through the "
                         "staged batch path (run_answers_batch — one "
                         "retrieval stream, rerank, gen_batch-row decodes; "
                         "the cli.py --batch-answers shape)")
    ap.add_argument("--gen-batch", type=int, default=8,
                    help="decode rows per dispatch in --answer-eval "
                         "(tpu.local_llm_gen_batch)")
    ap.add_argument("--cascade-carry", action="store_true",
                    help="cascade stage 2 resumes from carried stage-1 "
                         "hidden states (tpu.cascade_carry)")
    ap.add_argument("--cascade", type=int, default=0, metavar="KEEP",
                    help="also time the two-stage cascade "
                         "(use_efficient=3) with this cascade_keep")
    ap.add_argument("--budget", type=float, default=0, metavar="S",
                    help="wall-clock budget for this process (the driver "
                         "bench passes its remaining deadline): once the "
                         "flagship metrics (with_generation + answer_eval) "
                         "are in, the continuity variants (exit/cascade/"
                         "dense-route) are skipped rather than risking a "
                         "mid-measurement kill")
    ap.add_argument("--preset", default="",
                    help="yaml config preset whose quant/cascade/local-llm "
                         "knobs set the corresponding flags — "
                         "configs/four_tenant.yaml reproduces the flagship "
                         "four-tenant boot in one token (VERDICT r4 #5); "
                         "explicit flags still override")
    args = ap.parse_args()
    t_proc0 = time.monotonic()

    def over_budget(margin_s: float) -> bool:
        """True when fewer than ``margin_s`` seconds of --budget remain."""
        if not args.budget:
            return False
        return time.monotonic() - t_proc0 > args.budget - margin_s

    if args.preset:
        apply_preset(args)

    import jax
    import jax.numpy as jnp

    ns = build_system(tiny=args.tiny, docs=args.docs,
                      with_embedder=not args.skip_embedder,
                      rr_quant=args.reranker_quant,
                      em_quant=args.embedder_quant)
    pipeline, scorer, reranker = ns.pipeline, ns.scorer, ns.reranker
    dense_index, n_nodes, used = ns.dense_index, ns.n_nodes, ns.hbm_used
    em_cfg, embed_params = ns.em_cfg, ns.embed_params

    loop = asyncio.new_event_loop()
    queries = [make_query(ns) for _ in range(max(args.queries, 3))]

    # CUMULATIVE result emission (VERDICT r4 #1): the driver-side wrapper
    # (bench.py) keeps the LAST JSON line this tool printed, so a budget
    # kill mid-run salvages every milestone already measured instead of
    # losing the whole record. Every milestone below updates `summary` and
    # re-prints it; the final print is just the last cumulative line.
    summary = {
        "pipeline_p50_ms_cutoff28": None,
        "pipeline_p50_ms_exit12": None,
        "pipeline_p50_ms_exit_declined": None,
        "pipeline_p50_ms_cascade": None,
        "pipeline_p50_ms_with_generation": (
            None if args.local_llm else "not run (needs --local-llm)"
        ),
        "local_llm_quant": args.local_llm_quant if args.local_llm else None,
        "answer_eval_qps": None,
        "answer_eval_n": args.answer_eval or None,
        "retrieval_only_qps_coresident": None,
        "dense_route_incl_embed_qps": None,
        "hbm_bytes_in_use": ns.hbm_used,
        "n_nodes": n_nodes,
        "elapsed_s": 0,
    }
    t_main0 = time.monotonic()

    def emit_summary(**kv):
        summary.update(kv)
        summary["elapsed_s"] = round(time.monotonic() - t_main0, 1)
        print(json.dumps(summary), flush=True)

    # first cumulative line BEFORE any timed work: a budget kill during the
    # first compile must still salvage the boot facts (r5 driver run: the
    # subprocess died building the system with zero JSON flushed)
    emit_summary()

    # ---- retrieval-only batch qps co-resident ----------------------------
    saved_rr = pipeline.reranker
    pipeline.reranker = None
    rq = [{"query": make_query(ns)} for _ in range(args.retrieval_queries)]
    print("[retrieval-only] warming the stream scorer...", flush=True)
    loop.run_until_complete(pipeline.run_retrieval_batch(rq))  # warm/compile
    print("[retrieval-only] warm, timing", flush=True)
    t0 = time.perf_counter()
    loop.run_until_complete(pipeline.run_retrieval_batch(rq))
    retr_qps = len(rq) / (time.perf_counter() - t0)
    pipeline.reranker = saved_rr
    print(f"[retrieval-only] {retr_qps:.0f} qps co-resident", flush=True)
    emit_summary(retrieval_only_qps_coresident=round(retr_qps, 1))

    # ---- full run(query) p50: cutoff 28 ----------------------------------
    def timed_runs(tag, n):
        times = []
        for i in range(n):
            t0 = time.perf_counter()
            res = loop.run_until_complete(
                pipeline.run({"query": queries[i % len(queries)]})
            )
            times.append(time.perf_counter() - t0)
            assert res["contexts"]
        times = np.array(times)
        print(
            f"[{tag}] p50 {np.percentile(times, 50)*1000:.0f} ms  "
            f"p95 {np.percentile(times, 95)*1000:.0f} ms  "
            f"({n} queries, {1/np.mean(times):.3f} qps)",
            flush=True,
        )
        return float(np.percentile(times, 50))

    # warm/compile the rerank path once
    print("[full route] compiling the rerank path...", flush=True)
    loop.run_until_complete(pipeline.run({"query": queries[0]}))
    p50_full = timed_runs("full route, cutoff 28", args.queries)
    emit_summary(pipeline_p50_ms_cutoff28=round(p50_full * 1000, 1))

    # ---- full route + REAL on-chip generation ----------------------------
    # (runs BEFORE the exit/cascade p50 variants: with_generation +
    # answer_eval_qps are the verdict-demanded flagship metrics, so a
    # driver budget kill must lose the continuity variants, not these)
    p50_gen = None
    if args.local_llm:
        # exception-safe: a four-tenant OOM must degrade to an error
        # string in the JSON, not kill the other metrics
        try:
            local = make_local_llm(
                args.local_llm, tiny=args.tiny, quant=args.local_llm_quant
            )
            account(f"local_llm_7b_{args.local_llm_quant}", local.params)
            used = hbm_stats("with local LLM loaded")
            saved_llm = pipeline.llm
            pipeline.llm = local
            if args.cascade:  # generation on the fastest full-quality mode
                reranker.use_efficient = 3
                reranker.cascade_keep = args.cascade
                reranker.cascade_carry = args.cascade_carry
            # RECORDED warmup (r5): an unwarmed (bucket, B) lands a cold
            # multi-minute remote compile INSIDE the timed window
            # (measured: a 718 s p95), but warming every pair costs ~a
            # minute per big-graph cache load through the tunnel — the
            # driver bench's budget eater. So run the timed queries once
            # with generation swapped for a prompt recorder (retrieval +
            # rerank run for REAL, compiling that path), then warm ONLY
            # the (bucket, B=1) executables the recorded prompts hit.
            rec_seq = []
            real_gb = local.generate_batch
            local.generate_batch = (
                lambda ps: (rec_seq.extend(ps), [""] * len(ps))[1]
            )
            for q in queries:
                loop.run_until_complete(pipeline.run({"query": q}))
            local.generate_batch = real_gb
            seq_pairs = sorted(
                {p for pr in rec_seq for p in local.plan_groups([pr])}
            )
            print("[full route + generation] warming recorded pairs "
                  f"{seq_pairs}...", flush=True)
            local.warmup(pairs=seq_pairs)
            loop.run_until_complete(pipeline.run({"query": queries[0]}))
            p50_gen = timed_runs(
                f"full route + ON-CHIP generation (max_new={args.local_llm}, "
                f"prompt~{local.prompt_tokens} tok, {args.local_llm_quant}"
                + (f", cascade keep={args.cascade}" if args.cascade else "")
                + ")",
                args.queries,
            )
            emit_summary(
                pipeline_p50_ms_with_generation=round(p50_gen * 1000, 1),
                hbm_bytes_in_use=used,
            )
            # ---- staged batch answer-eval (VERDICT r3 #7) -------------
            # cli.py --batch-answers shape: the whole query set through
            # run_answers_batch (one retrieval stream -> rerank ->
            # gen_batch-row bucketed decodes) — the reference's batch eval
            # is a sequential per-query loop (src/main.py:48-52)
            if args.answer_eval:
                pipeline.local_llm = local
                local.max_batch = args.gen_batch
                aq = [{"query": make_query(ns)}
                      for _ in range(args.answer_eval)]
                # recorder pass: every prompt built through the REAL
                # staged retrieval + rerank (warming that path), then warm
                # exactly the (bucket, pow2-padded B) pairs the timed pass
                # will dispatch (plan_groups replays generate_batch's own
                # grouping, so the set is exact, not a guess)
                rec_aq = []
                local.generate_batch = (
                    lambda ps: (rec_aq.extend(ps), [""] * len(ps))[1]
                )
                loop.run_until_complete(pipeline.run_answers_batch(aq))
                local.generate_batch = real_gb
                ae_pairs = [p for p in local.plan_groups(rec_aq)
                            if p not in seq_pairs]
                print(f"[answer eval] warming recorded pairs {ae_pairs} "
                      f"({args.gen_batch}-row decode)...", flush=True)
                local.warmup(pairs=ae_pairs)
                t0 = time.perf_counter()
                res = loop.run_until_complete(pipeline.run_answers_batch(aq))
                wall = time.perf_counter() - t0
                assert len(res) == len(aq) and all(r["answer"] for r in res)
                answer_eval_qps = len(aq) / wall
                print(
                    f"[answer eval] {len(aq)} queries incl. retrieval + "
                    f"rerank + {args.local_llm}-token generation in "
                    f"{wall:.1f}s -> {answer_eval_qps:.3f} qps "
                    f"(sequential p50 was {p50_gen:.2f}s/query)",
                    flush=True,
                )
                emit_summary(answer_eval_qps=round(answer_eval_qps, 3))
            reranker.use_efficient = 0
            pipeline.llm = saved_llm
        except Exception as e:  # noqa: BLE001
            gen_error = f"{type(e).__name__}: {e}"[:200]
            print(f"[full route + generation] FAILED: {gen_error}", flush=True)
            if p50_gen is None:
                emit_summary(pipeline_p50_ms_with_generation=gen_error)

    # ---- early-exit p50 variants (r3 continuity) --------------------------
    p50_exit = p50_noexit = None
    if over_budget(180):
        print("[exit variants] skipped (budget)", flush=True)
        args.skip_exit = True
    if not args.skip_exit:
        # early exit ON, exit TAKEN: t=0 -> the layer-12 judge always fires
        # (random weights can't produce the checkpoint's score distribution,
        # so exit-rate is forced; the COST of the exit path is what's
        # measured — the reference's claimed saving, minus nothing)
        scorer.use_efficient = 1
        reranker.use_efficient = 1
        scorer.efficient_t = 0.0
        loop.run_until_complete(pipeline.run({"query": queries[0]}))  # compile segs
        p50_exit = timed_runs("full route, exit taken @12", args.queries)

        # exit DECLINED: t>1 never fires; measures the two-segment protocol
        # overhead vs the single-segment cutoff-28 run
        scorer.efficient_t = 2.0
        loop.run_until_complete(pipeline.run({"query": queries[0]}))
        p50_noexit = timed_runs("full route, exit declined", max(3, args.queries // 2))
        scorer.use_efficient = 0
        reranker.use_efficient = 0
        emit_summary(
            pipeline_p50_ms_exit12=round(p50_exit * 1000, 1),
            pipeline_p50_ms_exit_declined=round(p50_noexit * 1000, 1),
        )

    # ---- two-stage cascade (use_efficient=3, TPU extension) --------------
    p50_cascade = None
    if args.cascade and over_budget(100):
        print("[cascade] skipped (budget)", flush=True)
        args.cascade = 0
    if args.cascade:
        reranker.use_efficient = 3
        reranker.cascade_keep = args.cascade
        reranker.cascade_carry = args.cascade_carry
        loop.run_until_complete(pipeline.run({"query": queries[0]}))  # compile
        p50_cascade = timed_runs(
            f"full route, cascade keep={args.cascade}"
            + (" CARRIED" if args.cascade_carry else ""),
            args.queries,
        )
        reranker.use_efficient = 0
        emit_summary(pipeline_p50_ms_cascade=round(p50_cascade * 1000, 1))

    # ---- dense route incl. query embedding (short-seq bucket) ------------
    dense_route = None
    if embed_params is not None and over_budget(100):
        print("[dense route] skipped (budget)", flush=True)
        embed_params = None
    if embed_params is not None:
        from easyrag_tpu.models.layers import forward_hidden

        if args.embedder_w8a8:
            import dataclasses

            em_cfg = dataclasses.replace(em_cfg, act_quant=True)
        B, S = 32, 64  # short-query bucket: queries are ~a dozen terms

        @jax.jit
        def embed_and_search(p, ids, mask, matrix):
            h = forward_hidden(em_cfg, p, ids, mask)  # [B, S, D]
            q = h[:, -1, :]  # last-token pooling (gte contract)
            q = q / jnp.linalg.norm(q.astype(jnp.float32), axis=1, keepdims=True).astype(q.dtype)
            from easyrag_tpu.index.dense import dense_score_topk

            tv, ti = dense_score_topk(q, matrix, 288 if not args.tiny else 8)
            return tv, ti, ti.sum()

        ids = jax.random.randint(jax.random.key(11), (B, S), 0, em_cfg.vocab_size)
        mask = jnp.ones((B, S), jnp.int32)
        t0 = time.perf_counter()
        _, _, cks = embed_and_search(embed_params, ids, mask, dense_index.matrix)
        int(cks)
        print(f"[dense route] compile+first run {time.perf_counter()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, cks = embed_and_search(embed_params, ids, mask, dense_index.matrix)
            int(cks)
            best = min(best, time.perf_counter() - t0)
        dense_route = B / best
        print(
            f"[dense route incl. embedding] {dense_route:.0f} qps "
            f"({best*1000:.0f} ms / {B}-query batch, S={S}, "
            f"{args.embedder_quant} 7B embed + top-288)",
            flush=True,
        )

    # final cumulative line (identical key set to every partial line above;
    # --local-llm --local-llm-quant int4 is the FOUR-tenant boot: the int4
    # generator co-fits with the int8/int4 7B embedder, int8 generation
    # still needs --skip-embedder)
    emit_summary(
        dense_route_incl_embed_qps=(
            round(dense_route, 1) if dense_route else None
        ),
        hbm_bytes_in_use=used,
    )


if __name__ == "__main__":
    main()
