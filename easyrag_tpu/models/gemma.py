"""CostWise Gemma2 reranker with mid-network token compression (JAX).

Replaces the vendored ``CostWiseGemmaForCausalLM``
(``src/easyrag/utils/gemma_model.py`` / ``gemma_config.py``): a Gemma2
decoder whose sequence is *compressed* at designated layers — consecutive
passage hidden states mean-pooled in groups of ``compress_ratio`` (ragged
tail renormalized) while the query and prompt segments pass through intact,
with the attention mask rebuilt (``gemma_model.py:134-240``, invoked in the
decoder loop at :377-380). Per-layer score heads + ``cutoff_layers`` as in
MiniCPM (heads every ``layer_sep`` layers from ``start_layer``).

TPU-first shape handling: the reference's compressed length is
data-dependent (``max(final_useful_lengths)``). Query/prompt lengths are
host-known after tokenization, so the compressed length is computed on the
host per batch, bucketed to a multiple of 64, and passed as a *static*
``out_len`` — the kernel itself is fully static-shape (index arithmetic +
one gather-matmul), and later layers really do run at the shorter length,
which is the entire point of the scheme.

Right padding is required (as the reference enforces,
``gemma_model.py:377-379``); scores read the last *real* position via
mask-based pooling (``rerankers.py:193-201`` last_logit_pool).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    DecoderConfig,
    attention_bias_from_mask,
    decoder_layer,
    embed,
    rms_norm,
    rope_tables,
)


def gemma_config_from_hf(hf: Dict[str, Any], dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf.get("head_dim"),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        gemma=True,
        attn_logit_softcapping=hf.get("attn_logit_softcapping", 0.0) or 0.0,
        query_pre_attn_scalar=hf.get("query_pre_attn_scalar", 0.0) or 0.0,
        dtype=dtype,
    )


def token_compress(
    hidden: jnp.ndarray,  # [B, S, D]
    mask: jnp.ndarray,  # [B, S] (right padded)
    query_lengths: jnp.ndarray,  # [B]
    prompt_lengths: jnp.ndarray,  # [B]
    ratio: int,
    out_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape pooling of the passage segment.

    Output layout per row: [query | pooled passage groups | prompt | zeros],
    mask 1 on the first ``qlen+retain+plen`` positions. ``out_len`` must be
    ≥ every row's compressed length (host guarantees it).
    """
    b, s, d = hidden.shape
    qlen = query_lengths.astype(jnp.int32)[:, None]  # [B,1]
    plen = prompt_lengths.astype(jnp.int32)[:, None]
    seq_len = jnp.sum(mask, axis=1, dtype=jnp.int32)[:, None]
    passage_len = seq_len - qlen - plen
    retain = (passage_len + ratio - 1) // ratio
    final_len = qlen + plen + retain  # [B,1]

    j = jnp.arange(out_len, dtype=jnp.int32)[None, :]  # [1, out_len]
    in_query = j < qlen
    in_passage = (j >= qlen) & (j < qlen + retain)
    in_prompt = (j >= qlen + retain) & (j < final_len)

    g = j - qlen  # passage group index where in_passage
    # slot i of group g reads source position qlen + g*ratio + i
    i = jnp.arange(ratio, dtype=jnp.int32)[None, None, :]  # [1,1,r]
    passage_src = qlen[:, :, None] + g[:, :, None] * ratio + i  # [B,out,r]
    passage_valid = in_passage[:, :, None] & (
        g[:, :, None] * ratio + i < passage_len[:, :, None]
    )
    # group member count for mean weights
    count = jnp.sum(passage_valid, axis=2, keepdims=True)  # [B,out,1]
    passage_w = jnp.where(
        passage_valid, 1.0 / jnp.maximum(count, 1).astype(jnp.float32), 0.0
    )

    # query/prompt copy through slot 0
    prompt_src = qlen + passage_len + (j - qlen - retain)
    copy_src = jnp.where(in_query, j, jnp.where(in_prompt, prompt_src, 0))
    copy_w = jnp.where(in_query | in_prompt, 1.0, 0.0)[:, :, None]  # [B,out,1]

    src = jnp.where(in_passage[:, :, None], passage_src, copy_src[:, :, None])
    w = jnp.where(in_passage[:, :, None], passage_w, 0.0)
    w = w.at[:, :, 0].add(copy_w[:, :, 0])
    src = jnp.clip(src, 0, s - 1)

    gathered = jnp.take_along_axis(
        hidden, src.reshape(b, out_len * ratio, 1), axis=1
    ).reshape(b, out_len, ratio, d)
    new_hidden = jnp.einsum(
        "bjr,bjrd->bjd", w, gathered.astype(jnp.float32)
    ).astype(hidden.dtype)
    new_mask = (j < final_len).astype(mask.dtype)
    return new_hidden, new_mask


@functools.partial(jax.jit, static_argnames=("cfg", "start", "end"))
def _gemma_segment(cfg, params, hidden, mask, start: int, end: int):
    b, s = mask.shape
    position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    cos, sin = rope_tables(position_ids, cfg.hd, cfg.rope_theta)
    bias = attention_bias_from_mask(mask)
    for idx in range(start, end):
        hidden = decoder_layer(cfg, params["layers"][idx], hidden, bias, cos, sin, mask=mask)
    return hidden


@functools.partial(jax.jit, static_argnames=("cfg", "ratio", "out_len"))
def _compress_step(cfg, hidden, mask, qlens, plens, ratio: int, out_len: int):
    return token_compress(hidden, mask, qlens, plens, ratio, out_len)


@functools.partial(jax.jit, static_argnames=("cfg", "layer"))
def _gemma_layer_score(cfg, params, hidden, mask, layer: int):
    """norm -> head -> logit at the last real position (right padding)."""
    normed = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps, gemma=True)
    head_w = params["heads"][layer]  # [1, D]
    logits = jnp.einsum(
        "bsd,od->bso", normed.astype(jnp.float32), head_w.astype(jnp.float32)
    )[..., 0]
    lengths = jnp.sum(mask, axis=1) - 1
    return jnp.take_along_axis(logits, lengths[:, None], axis=1)[:, 0]


class GemmaCostWiseReranker:
    """(query, passage) scorer with token compression, LLMRerank-compatible."""

    def __init__(
        self,
        cfg: DecoderConfig,
        params: Dict[str, Any],
        tokenizer,
        cutoff_layer: int = 28,
        compress_layer: Tuple[int, ...] = (24, 40),
        compress_ratio: int = 2,
        max_length: int = 1024,
    ) -> None:
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.cutoff_layer = cutoff_layer
        self.compress_layer = tuple(sorted(compress_layer))
        self.compress_ratio = compress_ratio
        self.max_length = max_length
        self.prompt = "Predict whether passage B contains an answer to query A."

    # tokenization mirrors get_inputs_v2_5 (rerankers.py:203-249): right
    # padding, and the query/prompt segment lengths returned for compression
    def build_inputs(self, pairs: List[Tuple[str, str]]):
        tk = self.tokenizer
        prompt_ids = tk(self.prompt, add_special_tokens=False)["input_ids"]
        sep_ids = tk("\n", add_special_tokens=False)["input_ids"]
        rows, qlens, plens = [], [], []
        for query, passage in pairs:
            q_ids = tk(
                f"A: {query}", add_special_tokens=False,
                max_length=self.max_length * 3 // 4, truncation=True,
            )["input_ids"]
            p_ids = tk(
                f"B: {passage}", add_special_tokens=False,
                max_length=self.max_length, truncation=True,
            )["input_ids"]
            first = [tk.bos_token_id] + q_ids
            second = (sep_ids + p_ids)[: max(self.max_length - len(first), 0)]
            rows.append(first + second + sep_ids + prompt_ids)
            qlens.append(len(first) + len(sep_ids))
            plens.append(len(sep_ids + prompt_ids))
        # bucket to multiples of 128 for a bounded compile-cache (right
        # padding; mask-based last_logit_pool ignores the extra tail)
        max_len = max(((max(len(r) for r in rows) + 127) // 128) * 128, 128)
        pad_id = tk.pad_token_id if tk.pad_token_id is not None else 0
        ids = np.full((len(rows), max_len), pad_id, dtype=np.int32)
        mask = np.zeros((len(rows), max_len), dtype=np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r  # RIGHT padding (required by compression)
            mask[i, : len(r)] = 1
        return ids, mask, np.asarray(qlens, np.int32), np.asarray(plens, np.int32)

    @staticmethod
    def _bucket64(n: int) -> int:
        return ((int(n) + 63) // 64) * 64

    def score_pairs(
        self, pairs: List[Tuple[str, str]], judge: bool = False
    ) -> Tuple[np.ndarray, int]:
        ids_np, mask_np, qlens_np, plens_np = self.build_inputs(pairs)
        hidden = embed(self.cfg, self.params, jnp.asarray(ids_np))
        mask = jnp.asarray(mask_np)
        qlens, plens = jnp.asarray(qlens_np), jnp.asarray(plens_np)

        # host-side compressed-length planning (static shapes per bucket)
        seq_lens = mask_np.sum(axis=1)
        cur = 0
        for comp_at in self.compress_layer:
            if comp_at == 0 or comp_at >= self.cutoff_layer:
                continue
            hidden = _gemma_segment(self.cfg, self.params, hidden, mask, cur, comp_at)
            passage = seq_lens - qlens_np - plens_np
            retain = -(-passage // self.compress_ratio)
            out_len = self._bucket64((qlens_np + plens_np + retain).max())
            hidden, mask = _compress_step(
                self.cfg, hidden, mask, qlens, plens,
                self.compress_ratio, int(out_len),
            )
            # after pooling the passage segment is the retained groups;
            # query/prompt lengths are unchanged
            seq_lens = qlens_np + plens_np + retain
            cur = comp_at
        hidden = _gemma_segment(
            self.cfg, self.params, hidden, mask, cur, self.cutoff_layer
        )
        scores = _gemma_layer_score(
            self.cfg, self.params, hidden, mask, self.cutoff_layer
        )
        return np.asarray(scores), self.cutoff_layer


def load_gemma_reranker(model_dir: str, quant: str = ""):
    import dataclasses

    from transformers import AutoTokenizer

    from .hf_loader import load_decoder_params, load_hf_config

    hf = load_hf_config(model_dir)
    cfg = gemma_config_from_hf(hf)
    if quant == "w8a8":
        cfg = dataclasses.replace(cfg, act_quant=True)
    start_layer = hf.get("start_layer", 8)
    layer_sep = hf.get("layer_sep", 1)
    params = load_decoder_params(
        model_dir, cfg.num_hidden_layers, start_layer=start_layer, gemma=True,
        head_layer_sep=layer_sep, quant=quant,
    )
    tok = AutoTokenizer.from_pretrained(model_dir, trust_remote_code=True)
    tok.padding_side = "right"
    return GemmaCostWiseReranker(cfg, params, tok)
