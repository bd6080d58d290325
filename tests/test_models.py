"""Model numerics: parity against HuggingFace torch implementations on tiny
random models, layerwise scoring semantics, early-exit protocol."""

import numpy as np
import pytest

import jax.numpy as jnp

from easyrag_tpu.models.hf_loader import params_from_state_dict
from easyrag_tpu.models.layers import DecoderConfig, forward_hidden


def _tiny_qwen2():
    import torch
    from transformers import Qwen2Config, Qwen2Model

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        attn_implementation="eager",
    )
    model = Qwen2Model(hf_cfg).eval().float()
    cfg = DecoderConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=10000.0,
        attention_bias=True,
        dtype=jnp.float32,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = params_from_state_dict(sd, cfg.num_hidden_layers, dtype=jnp.float32)
    return model, cfg, params


def test_qwen2_forward_matches_hf():
    import torch

    model, cfg, params = _tiny_qwen2()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 10)).astype(np.int64)
    mask = np.ones((2, 10), dtype=np.int64)
    mask[1, 7:] = 0  # right padding on row 1
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(
        forward_hidden(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    )
    # padded positions are junk in both; compare real positions only
    np.testing.assert_allclose(ours[0], ref[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ours[1, :7], ref[1, :7], rtol=2e-4, atol=2e-5)


def test_gte_pooling_and_normalize():
    from easyrag_tpu.models.qwen2 import embed_step

    _, cfg, params = _tiny_qwen2()
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(2, 8)).astype(np.int32)
    mask = np.ones((2, 8), dtype=np.int32)
    mask[1, 5:] = 0
    emb = np.asarray(embed_step(cfg, params, jnp.asarray(ids), jnp.asarray(mask)))
    h = np.asarray(forward_hidden(cfg, params, jnp.asarray(ids), jnp.asarray(mask)))
    manual0 = h[0, 7] / np.linalg.norm(h[0, 7])
    manual1 = h[1, 4] / np.linalg.norm(h[1, 4])
    np.testing.assert_allclose(emb[0], manual0, rtol=1e-5)
    np.testing.assert_allclose(emb[1], manual1, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)


def _tiny_llama_as_minicpm(scale_emb=1.0, scale_depth=0.0):
    """MiniCPM with unit scalings is a llama decoder; use HF LlamaModel as
    the oracle for the shared arch, and exercise scalings separately."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    torch.manual_seed(1)
    hf_cfg = LlamaConfig(
        vocab_size=96,
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    model = LlamaModel(hf_cfg).eval().float()
    cfg = DecoderConfig(
        vocab_size=96,
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=10000.0,
        scale_emb=scale_emb,
        scale_depth=scale_depth,
        dim_model_base=8.0,
        dtype=jnp.float32,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = params_from_state_dict(sd, cfg.num_hidden_layers, dtype=jnp.float32)
    return model, cfg, params


def test_minicpm_arch_matches_llama_with_unit_scales():
    import torch

    model, cfg, params = _tiny_llama_as_minicpm()
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 96, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), dtype=np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(forward_hidden(cfg, params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_minicpm_scalings_applied():
    from easyrag_tpu.models.layers import embed

    _, cfg, params = _tiny_llama_as_minicpm(scale_emb=12.0, scale_depth=1.4)
    ids = jnp.asarray(np.arange(6).reshape(1, 6))
    h = np.asarray(embed(cfg, params, ids))
    base = np.asarray(params["embed"])[np.arange(6)]
    np.testing.assert_allclose(h[0], base * 12.0, rtol=1e-6)
    assert cfg.residual_scale == pytest.approx(1.4 / np.sqrt(3))


def _scorer(use_efficient=0):
    from easyrag_tpu.models.minicpm import MiniCPMLayerWiseReranker

    _, cfg, params = _tiny_llama_as_minicpm()
    rng = np.random.default_rng(3)
    params["heads"] = {
        layer: jnp.asarray(rng.normal(size=(1, cfg.hidden_size)), jnp.float32)
        for layer in range(1, cfg.num_hidden_layers + 1)
    }

    class FakeTok:
        bos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=False, max_length=None, truncation=False):
            ids = [(hash(ch) % 90) + 2 for ch in text]
            if max_length is not None and truncation:
                ids = ids[:max_length]
            return {"input_ids": ids}

    return MiniCPMLayerWiseReranker(
        cfg, params, FakeTok(), start_layer=1, cutoff_layer=3,
        use_efficient=use_efficient, efficient_layers=(2,),
    )


def test_layerwise_cutoff_scoring_consistency():
    """Score at cutoff L == head_L(norm(hidden after L layers))[:, -1]."""
    scorer = _scorer()
    pairs = [("what is x", "x is a thing"), ("what is y", "unrelated")]
    scores, layer = scorer.score_pairs(pairs)
    assert layer == 3
    # manual recomputation
    ids, mask = scorer.build_inputs(pairs)
    h = forward_hidden(
        scorer.cfg, scorer.params, jnp.asarray(ids), jnp.asarray(mask), num_layers=3
    )
    scale = scorer.cfg.hidden_size / scorer.cfg.dim_model_base
    manual = (
        np.asarray(h)[:, -1, :] / scale @ np.asarray(scorer.params["heads"][3]).T
    )[:, 0]
    np.testing.assert_allclose(scores, manual, rtol=1e-4)


def test_build_inputs_left_padding_and_multiple_of_8():
    scorer = _scorer()
    assert scorer.padding_side == "left"  # FakeTok declares nothing
    ids, mask = scorer.build_inputs([("short q", "short p"), ("q" * 40, "p" * 300)])
    assert ids.shape[1] % 8 == 0
    # left padded: every row ends with a real token
    assert (mask[:, -1] == 1).all()
    assert mask[0, 0] == 0  # shorter row starts with padding


def test_padding_side_follows_checkpoint_tokenizer():
    """PARITY deviation #3: the checkpoint tokenizer's declared padding side
    decides the token layout (reference pads via tokenizer.pad,
    rerankers.py:284-290); scoring pools the last REAL position either way
    (last_logit_pool, rerankers.py:193-201)."""
    scorer = _scorer()
    scorer.tokenizer.padding_side = "right"
    from easyrag_tpu.models.minicpm import MiniCPMLayerWiseReranker

    right = MiniCPMLayerWiseReranker(
        scorer.cfg, scorer.params, scorer.tokenizer, start_layer=1, cutoff_layer=3
    )
    assert right.padding_side == "right"
    pairs = [("short q", "short p"), ("q" * 40, "p" * 300)]
    ids, mask = right.build_inputs(pairs)
    assert (mask[:, 0] == 1).all()  # rows start with real tokens
    assert mask[0, -1] == 0  # shorter row ends with padding

    # mask-derived scored position
    from easyrag_tpu.models.minicpm import last_real_index

    li = last_real_index(mask)
    assert (li == mask.sum(axis=1) - 1).all()

    # with right padding + causal masking the score is batch-composition
    # invariant: a pair scored alone equals the same pair in a ragged batch
    batch_scores, _ = right.score_pairs(pairs)
    solo_scores = [right.score_pairs([p])[0][0] for p in pairs]
    np.testing.assert_allclose(batch_scores, solo_scores, rtol=2e-4, atol=1e-5)

    # explicit arg overrides the tokenizer's declaration
    forced = MiniCPMLayerWiseReranker(
        scorer.cfg, scorer.params, scorer.tokenizer, start_layer=1,
        cutoff_layer=3, padding_side="left",
    )
    assert forced.padding_side == "left"


def test_early_exit_protocol():
    # threshold 0 -> always quit at the judge layer
    scorer = _scorer(use_efficient=1)
    scorer.efficient_t = 0.0
    pairs = [("q1", "p1"), ("q2", "p2"), ("q3", "p3")]
    scores, layer = scorer.score_pairs(pairs, judge=True)
    assert layer == 2  # exit at the judge layer
    # threshold > 1 -> never quit, run to cutoff
    scorer2 = _scorer(use_efficient=1)
    scorer2.efficient_t = 1.1
    scores2, layer2 = scorer2.score_pairs(pairs, judge=True)
    assert layer2 == 3
    # non-judge path with use_efficient=1 scores at the (possibly updated)
    # static cutoff without judging
    scores3, layer3 = scorer2.score_pairs(pairs, judge=False)
    assert layer3 == 3


def test_yes_logit_scorer():
    import jax

    from easyrag_tpu.models.layers import init_params
    from easyrag_tpu.models.yes_logit import YesLogitScorer

    _, cfg, _ = _tiny_qwen2()
    params = init_params(cfg, jax.random.key(2))
    params["lm_head"] = jax.random.normal(jax.random.key(3), (128, 32))

    class FakeTok:
        bos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=False, max_length=None, truncation=False):
            ids = [(hash(ch) % 120) + 2 for ch in text]
            if max_length is not None and truncation:
                ids = ids[:max_length]
            return {"input_ids": ids}

    scorer = YesLogitScorer(cfg, params, FakeTok(), max_length=64)
    pairs = [("q1", "passage one"), ("q2", "other")]
    scores, _ = scorer.score_pairs(pairs)
    assert scores.shape == (2,) and np.isfinite(scores).all()
    assert scores[0] != scores[1]
    # manual recomputation: yes-token logit at the last (real) position
    from easyrag_tpu.models.minicpm import MiniCPMLayerWiseReranker

    ids, mask = MiniCPMLayerWiseReranker.build_inputs(scorer._builder, pairs)
    import jax.numpy as jnp

    h = np.asarray(forward_hidden(cfg, params, jnp.asarray(ids), jnp.asarray(mask)))
    manual = h[:, -1, :] @ np.asarray(scorer.yes_row)
    np.testing.assert_allclose(scores, manual, rtol=1e-4)


def test_llm_rerank_wrapper_semantics():
    from easyrag_tpu.rerankers import LLMRerank
    from easyrag_tpu.schema import NodeWithScore, QueryBundle, TextNode

    class FakeScorer:
        cutoff_layer = 28

        def __init__(self):
            self.calls = []

        def score_pairs(self, pairs, judge=False):
            self.calls.append((len(pairs), judge))
            # score = passage length (deterministic, distinct)
            return np.array([len(p) for _, p in pairs], dtype=np.float32), 12

    scorer = FakeScorer()
    rr = LLMRerank(scorer, top_n=2, embed_bs=2, embed_type=0, use_efficient=1)
    nodes = [
        NodeWithScore(node=TextNode(text="x" * n), score=float(10 - n))
        for n in (1, 5, 3, 2, 4)
    ]
    out = rr.postprocess_nodes(nodes, QueryBundle(query_str="q"))
    # batches of 2: first batch judged; the tail batch is padded to the full
    # batch size (static compile shape) with the pad score sliced off
    assert scorer.calls == [(2, True), (2, False), (2, False)]
    # reranked by passage length desc, top 2
    assert [len(n.node.text) for n in out] == [5, 4]
    # retrieval scores preserved in metadata
    assert out[0].node.metadata["retrieval_score"] == 5.0
    # cutoff restored after the query
    assert scorer.cutoff_layer == 28


def test_tail_bucket_policy():
    from easyrag_tpu.rerankers import tail_bucket

    # halvings of bsz, floored at 8: the fused-256 operating point
    # (198 = 6x32 + 6) runs its tail at 8, not 32
    assert tail_bucket(6, 32) == 8
    assert tail_bucket(8, 32) == 8
    assert tail_bucket(9, 32) == 16
    assert tail_bucket(16, 32) == 16
    assert tail_bucket(17, 32) == 32
    assert tail_bucket(32, 32) == 32
    # never exceeds bsz; small bsz (< floor) unchanged
    assert tail_bucket(1, 8) == 8
    assert tail_bucket(1, 4) == 4
    assert tail_bucket(3, 2) == 2


def test_llm_rerank_tail_pads_to_bucket_not_full_batch():
    """A 38-pair fused set at embed_bs=32 scores as 32 + 8 (tail bucket),
    not 32 + 32 — identical scores, ~10% of the padded compute back."""
    from easyrag_tpu.rerankers import LLMRerank
    from easyrag_tpu.schema import NodeWithScore, QueryBundle, TextNode

    class FakeScorer:
        cutoff_layer = 28

        def __init__(self):
            self.calls = []

        def score_pairs(self, pairs, judge=False):
            self.calls.append((len(pairs), judge))
            return np.array([len(p) for _, p in pairs], dtype=np.float32), 12

    scorer = FakeScorer()
    rr = LLMRerank(scorer, top_n=38, embed_bs=32, embed_type=0)
    nodes = [
        NodeWithScore(node=TextNode(text="x" * (i + 1)), score=0.0)
        for i in range(38)
    ]
    out = rr.postprocess_nodes(nodes, QueryBundle(query_str="q"))
    assert scorer.calls == [(32, False), (8, False)]
    # scores are the real pairs' (pad slots sliced off), ordering intact
    assert [len(n.node.text) for n in out] == list(range(38, 0, -1))
