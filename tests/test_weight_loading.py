"""End-to-end checkpoint loading: a tiny HF Qwen2 checkpoint saved to disk
loads through the registry (safetensors -> pytree, tokenizer, GTE contract)
and matches the torch forward numerically."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def gte_checkpoint(tmp_path_factory):
    import torch
    from transformers import PreTrainedTokenizerFast, Qwen2Config, Qwen2Model

    try:
        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace
    except ImportError:
        pytest.skip("tokenizers package unavailable")

    out = tmp_path_factory.mktemp("models") / "tiny-gte-qwen2"
    torch.manual_seed(0)
    cfg = Qwen2Config(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        attn_implementation="eager",
    )
    model = Qwen2Model(cfg).eval().float()
    model.save_pretrained(str(out), safe_serialization=True)

    vocab = {f"w{i}": i for i in range(60)}
    vocab.update({"[UNK]": 60, "[PAD]": 61})
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]"
    )
    fast.save_pretrained(str(out))
    return str(out), model, fast


def test_registry_loads_gte_checkpoint(gte_checkpoint):
    import torch

    from easyrag_tpu.models.registry import load_embedder

    path, torch_model, tokenizer = gte_checkpoint
    emb = load_embedder(path, embed_type=1)  # "gte" in the dir name
    texts = ["w1 w2 w3", "w4 w5"]
    ours = emb.get_text_embeddings(texts)
    assert ours.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, rtol=1e-3)

    # torch oracle: last-token pool + l2 normalize (bf16 params -> loose rtol)
    enc = tokenizer(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        h = torch_model(**enc).last_hidden_state
    lengths = enc["attention_mask"].sum(1) - 1
    pooled = torch.stack([h[i, lengths[i]] for i in range(2)])
    expected = torch.nn.functional.normalize(pooled, p=2, dim=1).numpy()
    np.testing.assert_allclose(ours, expected, atol=0.04)


def test_registry_missing_path_raises():
    from easyrag_tpu.models.registry import load_embedder, load_reranker

    with pytest.raises(FileNotFoundError, match="no network egress"):
        load_embedder("Alibaba-NLP/gte-Qwen2-7B-instruct")
    with pytest.raises(FileNotFoundError, match="no network egress"):
        load_reranker("BAAI/bge-reranker-v2-minicpm-layerwise")


def test_w8a8_load_sets_act_quant_and_int8_weights(gte_checkpoint):
    """quant="w8a8" must flip cfg.act_quant AND store int8 matmul weights —
    dropping either silently reverts to a slower path (the registry's
    reranker branches all plumb quant through; this pins the loader end)."""
    from easyrag_tpu.models.hf_loader import load_qwen2_embedder

    path, _, _ = gte_checkpoint
    cfg, params = load_qwen2_embedder(path, quant="w8a8")
    assert cfg.act_quant is True
    q = params["layers"][0]["attn"]["q"]
    assert "w_q" in q and q["w_q"].dtype == np.int8

    cfg0, _ = load_qwen2_embedder(path, quant="int8")
    assert cfg0.act_quant is False  # weight-only: bf16 activations
