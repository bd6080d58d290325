"""Gemma cost-wise reranker: arch parity vs HF Gemma2Model, token
compression vs a numpy oracle, end-to-end scoring shape/consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from easyrag_tpu.models.gemma import (
    GemmaCostWiseReranker,
    gemma_config_from_hf,
    token_compress,
)
from easyrag_tpu.models.hf_loader import params_from_state_dict


def _tiny_gemma():
    import torch
    from transformers import Gemma2Config, Gemma2Model

    torch.manual_seed(0)
    hf_cfg = Gemma2Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        max_position_embeddings=128,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=None,
        query_pre_attn_scalar=8,
        sliding_window=4096,  # >> seq: never binds (reranker regime)
        attn_implementation="eager",
    )
    model = Gemma2Model(hf_cfg).eval().float()
    cfg = gemma_config_from_hf(
        {
            "vocab_size": 128,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 8,
            "rms_norm_eps": hf_cfg.rms_norm_eps,
            "rope_theta": hf_cfg.rope_theta,
            "attn_logit_softcapping": 50.0,
            "query_pre_attn_scalar": 8,
        },
        dtype=jnp.float32,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = params_from_state_dict(sd, 2, gemma=True, dtype=jnp.float32)
    return model, cfg, params


def test_gemma_forward_matches_hf():
    import torch

    from easyrag_tpu.models.layers import forward_hidden

    model, cfg, params = _tiny_gemma()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(
        forward_hidden(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours[0], ref[0], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(ours[1, :9], ref[1, :9], rtol=3e-4, atol=3e-5)


def _compress_oracle(hidden, mask, qlens, plens, ratio):
    """Straightforward per-row implementation of the compression spec."""
    b, s, d = hidden.shape
    rows, masks = [], []
    for r in range(b):
        seq = int(mask[r].sum())
        q, p = int(qlens[r]), int(plens[r])
        passage = hidden[r, q : seq - p]
        groups = []
        for g in range(0, len(passage), ratio):
            groups.append(passage[g : g + ratio].mean(axis=0))
        pooled = np.stack(groups) if groups else np.zeros((0, d), hidden.dtype)
        new = np.concatenate([hidden[r, :q], pooled, hidden[r, seq - p : seq]])
        rows.append(new)
        masks.append(len(new))
    out_len = max(masks)
    out = np.zeros((b, out_len, d), dtype=hidden.dtype)
    out_mask = np.zeros((b, out_len), dtype=np.int32)
    for r, new in enumerate(rows):
        out[r, : len(new)] = new
        out_mask[r, : len(new)] = 1
    return out, out_mask


def test_token_compress_matches_oracle():
    rng = np.random.default_rng(1)
    b, s, d, ratio = 3, 23, 8, 2
    hidden = rng.normal(size=(b, s, d)).astype(np.float32)
    qlens = np.array([4, 6, 3], np.int32)
    plens = np.array([3, 3, 3], np.int32)
    seqs = np.array([23, 17, 12], np.int32)  # row 0 unpadded, others padded
    mask = np.zeros((b, s), np.int32)
    for r in range(b):
        mask[r, : seqs[r]] = 1
    expect, expect_mask = _compress_oracle(hidden, mask, qlens, plens, ratio)
    out_len = expect.shape[1] + 5  # ours may use a larger static bucket
    got, got_mask = token_compress(
        jnp.asarray(hidden), jnp.asarray(mask), jnp.asarray(qlens),
        jnp.asarray(plens), ratio, out_len,
    )
    got, got_mask = np.asarray(got), np.asarray(got_mask)
    for r in range(b):
        n = int(expect_mask[r].sum())
        assert got_mask[r].sum() == n
        np.testing.assert_allclose(got[r, :n], expect[r, :n], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got[r, n:], 0.0, atol=1e-6)


def test_token_compress_ragged_tail_mean():
    # passage of length 5, ratio 2 -> groups [2,2,1]; tail group is a plain
    # mean over one element, not a half-weighted sum
    hidden = np.arange(10, dtype=np.float32).reshape(1, 10, 1)
    mask = np.ones((1, 10), np.int32)
    qlens, plens = np.array([2], np.int32), np.array([3], np.int32)
    got, got_mask = token_compress(
        jnp.asarray(hidden), jnp.asarray(mask), jnp.asarray(qlens),
        jnp.asarray(plens), 2, 8,
    )
    got = np.asarray(got)[0, :, 0]
    # layout: [h0, h1, mean(h2,h3), mean(h4,h5), h6, h7, h8, h9->prompt]
    np.testing.assert_allclose(got[:7], [0, 1, 2.5, 4.5, 6, 7, 8])
    assert np.asarray(got_mask)[0].sum() == 8


def test_gemma_two_compression_points():
    """Both compress layers fire when cutoff exceeds them; sequence shrinks
    twice and scoring still reads the last real position."""
    import jax

    from easyrag_tpu.models.layers import DecoderConfig, init_params

    cfg = DecoderConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, gemma=True, attn_logit_softcapping=50.0,
        query_pre_attn_scalar=8, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(3)
    params["heads"] = {4: jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)}

    class FakeTok:
        bos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=False, max_length=None, truncation=False):
            ids = [(hash(ch) % 120) + 2 for ch in text]
            if max_length is not None and truncation:
                ids = ids[:max_length]
            return {"input_ids": ids}

    pairs = [("查询一", "很长的文档内容 " * 20), ("查询二", "短文")]
    double = GemmaCostWiseReranker(
        cfg, params, FakeTok(), cutoff_layer=4, compress_layer=(1, 3),
        compress_ratio=2, max_length=128,
    )
    s2, layer = double.score_pairs(pairs)
    assert layer == 4 and np.isfinite(s2).all()
    single = GemmaCostWiseReranker(
        cfg, params, FakeTok(), cutoff_layer=4, compress_layer=(1,),
        compress_ratio=2, max_length=128,
    )
    s1, _ = single.score_pairs(pairs)
    # the second compression changes the computation
    assert not np.allclose(s2, s1)
    # a compress point at/after the cutoff is skipped: (1, 4) == (1,)
    at_cutoff = GemmaCostWiseReranker(
        cfg, params, FakeTok(), cutoff_layer=4, compress_layer=(1, 4),
        compress_ratio=2, max_length=128,
    )
    s3, _ = at_cutoff.score_pairs(pairs)
    np.testing.assert_allclose(s3, s1, rtol=1e-5)


def test_gemma_scorer_end_to_end_with_compression():
    import jax

    from easyrag_tpu.models.layers import init_params

    _, cfg, _ = _tiny_gemma()
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(2)
    params["heads"] = {
        2: jnp.asarray(rng.normal(size=(1, cfg.hidden_size)), jnp.float32)
    }

    class FakeTok:
        bos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=False, max_length=None, truncation=False):
            ids = [(hash(ch) % 120) + 2 for ch in text]
            if max_length is not None and truncation:
                ids = ids[:max_length]
            return {"input_ids": ids}

    scorer = GemmaCostWiseReranker(
        cfg, params, FakeTok(), cutoff_layer=2, compress_layer=(1,),
        compress_ratio=2, max_length=64,
    )
    pairs = [("what is x", "x is a thing " * 4), ("what is y", "short")]
    scores, layer = scorer.score_pairs(pairs)
    assert layer == 2 and scores.shape == (2,)
    assert np.isfinite(scores).all()
    # compression changes the computation vs no-compression
    scorer_nc = GemmaCostWiseReranker(
        cfg, params, FakeTok(), cutoff_layer=2, compress_layer=(),
        compress_ratio=2, max_length=64,
    )
    scores_nc, _ = scorer_nc.score_pairs(pairs)
    assert not np.allclose(scores, scores_nc)
