"""Real-weight readiness without real weights.

Real checkpoints ship as SHARDED safetensors (``model-0000x-of-0000N`` +
``model.safetensors.index.json`` — the layout of gte-Qwen2-7B-instruct and
bge-reranker-v2-minicpm-layerwise, reference download via
``scripts/download.sh``). These tests build that exact on-disk layout with
tiny tensors and drive the REAL loading paths: shard streaming, int8
weight-only quantization, checkpoint-declared tokenizer padding side
(PARITY deviation #3), and a full pipeline boot (dense + rerank) from
checkpoint directories.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _reshard(model_dir: str, n_shards: int = 2) -> None:
    """Rewrite a single-file checkpoint as sharded files + index.json —
    the canonical multi-file layout of real 7B checkpoints."""
    from safetensors.numpy import load_file, save_file

    single = os.path.join(model_dir, "model.safetensors")
    tensors = load_file(single)
    os.remove(single)
    names = sorted(tensors)
    weight_map = {}
    for s in range(n_shards):
        shard_names = names[s::n_shards]
        fname = f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
        save_file({n: tensors[n] for n in shard_names}, os.path.join(model_dir, fname))
        for n in shard_names:
            weight_map[n] = fname
    with open(os.path.join(model_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)


def _word_tokenizer(pad="[PAD]", bos="<s>", padding_side=None):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {f"w{i}": i for i in range(60)}
    vocab.update({"[UNK]": 60, pad: 61, bos: 62, "Yes": 63})
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    kw = {}
    if padding_side:
        kw["padding_side"] = padding_side
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token=pad, bos_token=bos, **kw
    )


@pytest.fixture(scope="module")
def sharded_gte_checkpoint(tmp_path_factory):
    """Tiny gte-Qwen2 checkpoint in the REAL sharded layout."""
    from transformers import Qwen2Config, Qwen2Model

    out = tmp_path_factory.mktemp("ckpt") / "gte-qwen2-sharded"
    torch.manual_seed(0)
    cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    Qwen2Model(cfg).eval().float().save_pretrained(str(out), safe_serialization=True)
    _reshard(str(out), n_shards=3)
    _word_tokenizer().save_pretrained(str(out))
    return str(out)


@pytest.fixture(scope="module")
def minicpm_checkpoint(tmp_path_factory):
    """Tiny bge-reranker-v2-minicpm-layerwise checkpoint: llama-family
    weights + per-layer ``lm_head.{j}.linear_head.weight`` score heads +
    a tokenizer DECLARING right padding (the knob PARITY #3 hinges on)."""
    from safetensors.numpy import save_file

    out = tmp_path_factory.mktemp("ckpt") / "bge-reranker-v2-minicpm-layerwise-tiny"
    os.makedirs(out)
    rng = np.random.default_rng(1)
    D, I, L, V = 32, 64, 3, 64
    cfg = {
        "architectures": ["LayerWiseMiniCPMForCausalLM"],
        "vocab_size": V, "hidden_size": D, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0, "scale_emb": 12.0, "scale_depth": 1.4,
        "dim_model_base": 16, "start_layer": 1, "head_multi": True,
    }
    with open(out / "config.json", "w") as f:
        json.dump(cfg, f)

    def w(*shape, scale=0.05):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    tensors = {
        "model.embed_tokens.weight": w(V, D),
        "model.norm.weight": np.ones(D, np.float32),
    }
    for i in range(L):
        p = f"model.layers.{i}"
        tensors.update({
            f"{p}.self_attn.q_proj.weight": w(D, D),
            f"{p}.self_attn.k_proj.weight": w(D // 2, D),
            f"{p}.self_attn.v_proj.weight": w(D // 2, D),
            f"{p}.self_attn.o_proj.weight": w(D, D),
            f"{p}.mlp.gate_proj.weight": w(I, D),
            f"{p}.mlp.up_proj.weight": w(I, D),
            f"{p}.mlp.down_proj.weight": w(D, I),
            f"{p}.input_layernorm.weight": np.ones(D, np.float32),
            f"{p}.post_attention_layernorm.weight": np.ones(D, np.float32),
        })
    # heads for layers start_layer..L (j=0 -> layer 1, ...)
    for j in range(L):
        tensors[f"lm_head.{j}.linear_head.weight"] = w(1, D)
    save_file(tensors, str(out / "model.safetensors"))
    _reshard(str(out), n_shards=2)
    _word_tokenizer(padding_side="right").save_pretrained(str(out))
    return str(out)


def test_sharded_index_streaming_equals_torch(sharded_gte_checkpoint):
    """Shard list comes from index.json; weights land correctly (numerics
    vs the torch forward, like test_weight_loading on the 1-file layout)."""
    from transformers import AutoTokenizer, Qwen2Model

    from easyrag_tpu.models.hf_loader import _safetensor_files
    from easyrag_tpu.models.registry import load_embedder

    files = _safetensor_files(sharded_gte_checkpoint)
    assert len(files) == 3 and all("-of-00003" in f for f in files)

    emb = load_embedder(sharded_gte_checkpoint, embed_type=1)
    texts = ["w1 w2 w3", "w4 w5"]
    ours = emb.get_text_embeddings(texts)
    torch_model = Qwen2Model.from_pretrained(sharded_gte_checkpoint).eval().float()
    tokenizer = AutoTokenizer.from_pretrained(sharded_gte_checkpoint)
    enc = tokenizer(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        h = torch_model(**enc).last_hidden_state
    lengths = enc["attention_mask"].sum(1) - 1
    pooled = torch.stack([h[i, lengths[i]] for i in range(2)])
    expected = torch.nn.functional.normalize(pooled, p=2, dim=1).numpy()
    np.testing.assert_allclose(ours, expected, atol=0.04)


def test_int8_quantized_embedder(sharded_gte_checkpoint):
    from easyrag_tpu.models.registry import load_embedder

    full = load_embedder(sharded_gte_checkpoint, embed_type=1)
    q = load_embedder(sharded_gte_checkpoint, embed_type=1, quant="int8")
    # all matmul weights stored int8 + f32 per-channel scales
    for layer in q.params["layers"]:
        for group in ("attn", "mlp"):
            for leaf in layer[group].values():
                assert leaf["w_q"].dtype == np.int8
                assert "w" not in leaf
    # HBM bytes: int8+scale < half of the bf16 storage
    def matmul_bytes(params):
        total = 0
        for layer in params["layers"]:
            for group in ("attn", "mlp"):
                for leaf in layer[group].values():
                    total += sum(
                        v.nbytes for k, v in leaf.items() if k in ("w", "w_q", "scale")
                    )
        return total

    assert matmul_bytes(q.params) < 0.6 * matmul_bytes(full.params)
    # quantization error stays small on unit-norm outputs
    texts = ["w1 w2 w3", "w4 w5 w6 w7"]
    a = full.get_text_embeddings(texts)
    b = q.get_text_embeddings(texts)
    np.testing.assert_allclose(a, b, atol=0.08)
    # cosine agreement per row
    assert ((a * b).sum(axis=1) > 0.99).all()


def test_minicpm_loader_reads_padding_side_and_heads(minicpm_checkpoint):
    from easyrag_tpu.models.registry import load_reranker

    reranker = load_reranker(minicpm_checkpoint, top_n=2, embed_bs=4, embed_type=0)
    scorer = reranker.scorer
    # the judge layer (default 12) is clamped into the reduced checkpoint's
    # depth so the early-exit protocol can't index past the layer stack
    eff = load_reranker(
        minicpm_checkpoint, top_n=2, embed_bs=4, embed_type=0, use_efficient=1
    ).scorer
    assert eff.efficient_layers == (3,)
    s, layer = eff.score_pairs([("w1", "w2"), ("w3", "w4")], judge=True)
    assert layer in (3,) and np.isfinite(s).all()
    # PARITY #3: the checkpoint tokenizer declares right padding -> honored
    assert scorer.padding_side == "right"
    assert scorer.start_layer == 1
    assert sorted(scorer.params["heads"]) == [1, 2, 3]
    scorer.cutoff_layer = 3
    pairs = [("w1 w2", "w1 w2 w3"), ("w4", "w5 w6")]
    scores, layer = scorer.score_pairs(pairs)
    assert layer == 3 and np.isfinite(scores).all()
    # right padding + causal mask -> batch-composition invariant scores
    solo = [scorer.score_pairs([p])[0][0] for p in pairs]
    np.testing.assert_allclose(scores, solo, rtol=2e-4, atol=1e-5)


def test_full_pipeline_boots_from_checkpoint_dirs(
    tmp_path, sharded_gte_checkpoint, minicpm_checkpoint
):
    """Dense route + LLM rerank booted entirely from on-disk checkpoint
    directories through the registry (the production path,
    ``gte_embeddings.py:33-70`` / ``rerankers.py:142-176``)."""
    import asyncio

    from easyrag_tpu.config import EasyRAGConfig, TPUConfig
    from easyrag_tpu.pipeline import EasyRAGPipeline

    root = tmp_path / "corpus"
    (root / "director").mkdir(parents=True)
    (root / "director" / "a.txt").write_text(
        "w1 w2 w3\nw1 w2 w3 w4 w5。\n", encoding="utf-8"
    )
    (root / "director" / "b.txt").write_text(
        "w6 w7\nw6 w7 w8 w9。\n", encoding="utf-8"
    )
    (root / "pathmap.json").write_text(
        json.dumps({"director/a.txt": ["k", "a"], "director/b.txt": ["k", "b"]}),
        encoding="utf-8",
    )

    cfg = EasyRAGConfig(
        re_only=True,
        retrieval_type=1,
        # rerank_fusion_type=1 drives generation_with_rerank_fusion: the
        # dense route + reranker both come off the checkpoints (the default
        # path replicates the reference's sparse-only quirk, pipeline.py:357)
        rerank_fusion_type=1,
        use_reranker=2,
        embedding_name=sharded_gte_checkpoint,
        reranker_name=minicpm_checkpoint,
        vector_size=32,
        chunk_size=64,
        chunk_overlap=10,
        data_path=str(root),
        f_topk_1=4,
        r_topk=2,
        cache_path=str(tmp_path / "cache"),
        tpu=TPUConfig(use_pallas=False, embedder_quant="int8"),
    )
    pipeline = EasyRAGPipeline(cfg)
    # the reranker came off the checkpoint with right padding declared
    assert pipeline.reranker.scorer.padding_side == "right"
    res = asyncio.new_event_loop().run_until_complete(
        pipeline.run({"query": "w1 w2 w3"})
    )
    assert res["answer"] == ""
    assert len(res["nodes"]) <= 2 and res["contexts"]


def test_int4_and_w4a8_quantized_embedder(sharded_gte_checkpoint):
    """quant='int4'/'w4a8' through the embedder loader: nibble-packed
    matmuls + int8 embed table (the four-tenant co-residency layout),
    w4a8 additionally sets act_quant; outputs stay close to bf16 (coarser
    than int8 — int4 rounding) and cosine-consistent."""
    from easyrag_tpu.models.registry import load_embedder

    full = load_embedder(sharded_gte_checkpoint, embed_type=1)
    q4 = load_embedder(sharded_gte_checkpoint, embed_type=1, quant="int4")
    for layer in q4.params["layers"]:
        for group in ("attn", "mlp"):
            for leaf in layer[group].values():
                assert leaf["w_p"].dtype == np.int8
                assert "w" not in leaf and "w_q" not in leaf
    assert "w_q" in q4.params["embed"]  # int8 embed table rides along
    assert not q4.cfg.act_quant

    a = full.get_text_embeddings(["w1 w2 w3", "w4 w5 w6 w7"])
    b = q4.get_text_embeddings(["w1 w2 w3", "w4 w5 w6 w7"])
    assert ((a * b).sum(axis=1) > 0.95).all()  # int4: coarser than int8

    w4a8 = load_embedder(sharded_gte_checkpoint, embed_type=1, quant="w4a8")
    assert w4a8.cfg.act_quant
    c = w4a8.get_text_embeddings(["w1 w2 w3", "w4 w5 w6 w7"])
    assert ((a * c).sum(axis=1) > 0.95).all()
