"""LayerWise MiniCPM cross-encoder reranker (JAX).

Replaces the vendored ``LayerWiseMiniCPMForCausalLM``
(``src/easyrag/utils/modeling_minicpm_reranker.py`` and its early-exit
variant ``efficient_modeling_minicpm_reranker.py``).

Architecture (llama-family + mup-style scalings, config at
``configuration_minicpm_reranker.py``):
  * embeddings scaled by ``scale_emb``; residual branches scaled by
    ``scale_depth / sqrt(num_layers)``
  * one score head per layer in ``[start_layer, num_layers]``;
    ``cutoff_layers=[L]`` reads head ``L`` on ``norm(hidden after L layers)``
    (``modeling_minicpm_reranker.py:1081-1084``)
  * non-efficient path scales the head input by
    ``1/(hidden_size/dim_model_base)``
    (``modeling_minicpm_reranker.py:1316-1318``); the efficient variant
    applies the head on the *unscaled* hidden
    (``efficient_modeling_minicpm_reranker.py:1294``) — a reference
    inconsistency replicated here because the early-exit softmax criterion
    is scale-sensitive.

Early exit, TPU-first: the reference breaks out of the decoder loop at a
data-dependent layer — hostile to XLA. We split the stack into two
statically-compiled segments around the judge layer (12): run segment
``0->judge``, score, decide on host (max-prob or normalized-entropy
criterion, threshold ``efficient_t``), and only if continuing run segment
``judge->cutoff`` from the carried hidden state. Each segment compiles
once; the compute saved on exit matches the reference exactly
(``rerankers.py:311-345`` two-phase reuse for ``efficient_type=1``).
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


def minicpm_config_from_hf(hf: Dict[str, Any], dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        attention_bias=hf.get("attention_bias", False),
        scale_emb=hf.get("scale_emb", 1.0),
        scale_depth=hf.get("scale_depth", 0.0),
        dim_model_base=hf.get("dim_model_base", 0.0),
        dtype=dtype,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "start", "end"))
def _segment(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    hidden: jnp.ndarray,
    attention_mask: jnp.ndarray,
    start: int,
    end: int,
) -> jnp.ndarray:
    """Run decoder layers [start, end) from a carried hidden state."""
    s = attention_mask.shape[1]
    # [1, S] batch-shared positions: the flash64 path ropes in-kernel
    position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
    cos, sin = rope_tables(position_ids, cfg.hd, cfg.rope_theta)
    bias = attention_bias_from_mask(attention_mask)
    for idx in range(start, end):
        hidden = decoder_layer(
            cfg, params["layers"][idx], hidden, bias, cos, sin,
            mask=attention_mask,
        )
    return hidden


@functools.partial(jax.jit, static_argnames=("cfg",))
def _embed_tokens(cfg: DecoderConfig, params, input_ids):
    return embed(cfg, params, input_ids)


@functools.partial(jax.jit, static_argnames=("pad_left",))
def _gather_padded_rows(
    chunks: Tuple[jnp.ndarray, ...], idx: jnp.ndarray, pad_left: bool
) -> jnp.ndarray:
    """Pad each [b, S_c, D] chunk to the widest S, concatenate, gather
    ``idx`` rows — one dispatch for the whole cascade survivor assembly."""
    s_max = max(h.shape[1] for h in chunks)
    padded = []
    for h in chunks:
        pad = s_max - h.shape[1]
        width = ((0, 0), (pad, 0), (0, 0)) if pad_left else ((0, 0), (0, pad), (0, 0))
        padded.append(jnp.pad(h, width) if pad else h)
    return jnp.concatenate(padded, axis=0)[idx]


def last_real_index(mask_np: np.ndarray) -> np.ndarray:
    """Per-row index of the last real (mask=1) token — the scored position
    under either padding side (``rerankers.py:193-201`` last_logit_pool)."""
    m = np.asarray(mask_np)
    return (m.shape[1] - 1 - np.argmax(m[:, ::-1], axis=1)).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "layer", "scale_head_input"))
def _layer_score(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    hidden: jnp.ndarray,
    layer: int,
    last_idx: jnp.ndarray,  # [B] index of the last real token per row
    scale_head_input: bool = True,
) -> jnp.ndarray:
    """norm(hidden) -> per-sequence score at the last REAL position, f32 [B]
    (mask-based pooling like the reference's ``last_logit_pool``)."""
    normed = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if scale_head_input and cfg.dim_model_base:
        normed = normed / (cfg.hidden_size / cfg.dim_model_base)
    head_w = params["heads"][layer]  # [1, D]
    pooled = jnp.take_along_axis(
        normed, last_idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]
    logits = pooled.astype(jnp.float32) @ head_w.T.astype(jnp.float32)
    return logits[:, 0]


class MiniCPMLayerWiseReranker:
    """Scores (query, passage) pairs; the pipeline-facing reranker wrapper
    lives in ``easyrag_tpu.rerankers``.

    ``params["heads"]`` maps layer index -> [1, hidden] head weight for
    layers in [start_layer, num_layers].
    """

    def __init__(
        self,
        cfg: DecoderConfig,
        params: Dict[str, Any],
        tokenizer,
        start_layer: int = 8,
        cutoff_layer: int = 28,
        max_length: int = 1024,
        use_efficient: int = 0,
        efficient_t: float = 0.4,
        efficient_layers: Tuple[int, ...] = (12,),
        seq_bucket: int = 64,
        padding_side: str = "",
    ) -> None:
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.start_layer = start_layer
        self.cutoff_layer = cutoff_layer
        self.max_length = max_length
        self.use_efficient = use_efficient
        self.efficient_t = efficient_t
        # clamp judge layers into [start_layer, cutoff_layer] so reduced /
        # test checkpoints (depth < the reference's 40) can run the
        # early-exit protocol: every judge layer must have a score head
        # (heads exist from start_layer up) and lie inside the run segment
        self.efficient_layers = tuple(
            max(start_layer, min(j, cutoff_layer)) for j in efficient_layers
        )
        self.seq_bucket = seq_bucket
        # PARITY deviation #3 resolution: the reference pads through
        # tokenizer.pad (rerankers.py:284-290), i.e. the CHECKPOINT
        # tokenizer's declared side decides the token layout (and thus the
        # RoPE phases). Honor it: explicit arg > tokenizer.padding_side >
        # left (the TPU-friendly fallback for injected fake tokenizers).
        # Scoring always pools the last REAL position (last_logit_pool),
        # so both sides score the right token.
        self.padding_side = (
            padding_side or getattr(tokenizer, "padding_side", None) or "left"
        )
        self.prompt = (
            "Given a query A and a passage B, determine whether the passage "
            "contains an answer to the query by providing a prediction of "
            "either 'Yes' or 'No'."
        )

    # -- tokenization (mirrors rerankers.py:251-292) --------------------------

    def build_inputs(self, pairs: List[Tuple[str, str]]) -> Tuple[np.ndarray, np.ndarray]:
        """(query, passage) pairs -> padded (input_ids, attention_mask).

        Layout per pair: ``<bos> A: <query(<=3/4 max)> \\n B: <passage>``
        truncated to ``max_length`` keeping the query, then ``\\n <prompt>``.
        Padding side follows ``self.padding_side`` (checkpoint tokenizer's
        declaration); scoring pools the last real position either way.
        """
        tk = self.tokenizer
        prompt_ids = tk(self.prompt, add_special_tokens=False)["input_ids"]
        sep_ids = tk("\n", add_special_tokens=False)["input_ids"]
        rows = []
        for query, passage in pairs:
            q_ids = tk(
                f"A: {query}",
                add_special_tokens=False,
                max_length=self.max_length * 3 // 4,
                truncation=True,
            )["input_ids"]
            p_ids = tk(
                f"B: {passage}",
                add_special_tokens=False,
                max_length=self.max_length,
                truncation=True,
            )["input_ids"]
            first = [tk.bos_token_id] + q_ids
            second = sep_ids + p_ids
            room = self.max_length - len(first)
            second = second[: max(room, 0)]
            rows.append(first + second + sep_ids + prompt_ids)
        max_len = max(len(r) for r in rows)
        # the reference pads to a multiple of 8 (rerankers.py:290); we pad to
        # a bounded set of compile buckets (extra padding is masked out and,
        # with left padding, the scored last position stays real). flash64
        # accepts any x8 length, so the bucket only trades compile-cache
        # size against pad FLOPs: 64 (default) wastes <3% tokens with <=18
        # buckets at max_length 1024. r1's 512-bucket wasted 44%.
        bucket = self.seq_bucket
        max_len = max(((max_len + bucket - 1) // bucket) * bucket, bucket)
        pad_id = tk.pad_token_id if tk.pad_token_id is not None else 0
        ids = np.full((len(rows), max_len), pad_id, dtype=np.int32)
        mask = np.zeros((len(rows), max_len), dtype=np.int32)
        if getattr(self, "padding_side", "left") == "right":
            # checkpoint-declared right padding: real tokens at positions
            # 0..L-1 exactly as the reference's tokenizer.pad lays them out;
            # trailing pads are invisible to real tokens under the causal
            # mask, so scores are batch-composition invariant
            for i, r in enumerate(rows):
                ids[i, : len(r)] = r
                mask[i, : len(r)] = 1
        else:
            for i, r in enumerate(rows):
                ids[i, max_len - len(r):] = r
                mask[i, max_len - len(r):] = 1
        return ids, mask

    # -- scoring ---------------------------------------------------------------

    def _judge_quit(self, scores: np.ndarray) -> bool:
        """Early-exit criterion over the batch's scores
        (``efficient_modeling_minicpm_reranker.py:1256-1277``)."""
        s = np.asarray(scores, dtype=np.float64)
        p = np.exp(s - s.max())
        p = p / p.sum()
        if self.use_efficient == 1:  # max-prob criterion
            return bool(p.max() >= self.efficient_t)
        # entropy criterion (quits when normalized entropy is HIGH — the
        # reference's literal comparison, replicated)
        n = len(p)
        entropy = -np.sum(p * np.log(np.maximum(p, 1e-30)))
        return bool(entropy / (-np.log(1.0 / n)) >= self.efficient_t)

    def score_pairs_carry(
        self, pairs: List[Tuple[str, str]]
    ) -> Tuple[np.ndarray, Dict[str, Any]]:
        """Stage-1 cascade scoring that also returns the segment's hidden
        states, so stage 2 can RESUME at the judge layer instead of
        re-running layers [0, j) (the ROADMAP carry lever — saves
        ``keep x j`` layer-batches per query). Numerically identical to
        ``score_pairs(judge=False)``; the carry holds the post-layer-j
        hidden [B, S, D] on device plus the host mask."""
        ids_np, mask_np = self.build_inputs(pairs)
        ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)
        last_idx = jnp.asarray(last_real_index(mask_np))
        hidden = _embed_tokens(self.cfg, self.params, ids)
        hidden = _segment(self.cfg, self.params, hidden, mask, 0, self.cutoff_layer)
        scores = _layer_score(
            self.cfg, self.params, hidden, self.cutoff_layer, last_idx,
            scale_head_input=(self.use_efficient == 0),
        )
        return np.asarray(scores), {"hidden": hidden, "mask": mask_np}

    def score_carried(
        self,
        chunk_hiddens: List[jnp.ndarray],
        flat_idx: np.ndarray,
        masks_rows: np.ndarray,
        from_layer: int,
    ) -> np.ndarray:
        """Cascade stage 2 from carried stage-1 hidden states.

        ``chunk_hiddens``: per-stage-1-chunk ``[b_c, S_c, D]`` device
        arrays; ``flat_idx``: row indices into their concatenation (after
        each chunk is padded to the widest bucket); ``masks_rows``: the
        re-padded ``[N, S_max]`` masks. One jitted gather assembles the
        survivor batch on device — per-row indexing would pay the tunnel
        dispatch latency ~3N times.

        RoPE note: re-padding shifts LEFT-padded rows to new absolute
        positions; rotary attention depends only on position DIFFERENCES
        within a row (uniform shift), so scores match the re-run path up
        to bf16 tiling noise — the same batch-composition caveat the
        non-carried stage 2 already has (BASELINE.md).
        """
        pad_left = getattr(self, "padding_side", "left") != "right"
        hidden = _gather_padded_rows(
            tuple(chunk_hiddens), jnp.asarray(flat_idx), pad_left
        )
        mask = jnp.asarray(masks_rows)
        last_idx = jnp.asarray(last_real_index(masks_rows))
        h = _segment(
            self.cfg, self.params, hidden, mask, from_layer, self.cutoff_layer
        )
        scores = _layer_score(
            self.cfg, self.params, h, self.cutoff_layer, last_idx,
            scale_head_input=(self.use_efficient == 0),
        )
        return np.asarray(scores)

    def score_pairs(
        self, pairs: List[Tuple[str, str]], judge: bool = False
    ) -> Tuple[np.ndarray, int]:
        """Score one batch. Returns (scores[B], layer_used).

        ``judge=True`` runs the two-segment early-exit protocol; otherwise a
        single segment to ``self.cutoff_layer``.
        """
        ids_np, mask_np = self.build_inputs(pairs)
        ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)
        last_idx = jnp.asarray(last_real_index(mask_np))
        hidden = _embed_tokens(self.cfg, self.params, ids)
        scale = not judge and self.use_efficient == 0  # see module docstring
        if judge and self.efficient_layers:
            j = self.efficient_layers[0]
            hidden = _segment(self.cfg, self.params, hidden, mask, 0, j)
            scores = _layer_score(
                self.cfg, self.params, hidden, j, last_idx, scale_head_input=False
            )
            if self._judge_quit(np.asarray(scores)):
                return np.asarray(scores), j
            hidden = _segment(self.cfg, self.params, hidden, mask, j, self.cutoff_layer)
            scores = _layer_score(
                self.cfg, self.params, hidden, self.cutoff_layer, last_idx,
                scale_head_input=False,
            )
            return np.asarray(scores), self.cutoff_layer
        hidden = _segment(self.cfg, self.params, hidden, mask, 0, self.cutoff_layer)
        scores = _layer_score(
            self.cfg, self.params, hidden, self.cutoff_layer, last_idx,
            scale_head_input=scale,
        )
        return np.asarray(scores), self.cutoff_layer
