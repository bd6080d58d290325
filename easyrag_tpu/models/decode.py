"""TPU-native autoregressive generation: bucketed prefill + KV-cache decode.

The reference's local-LLM option runs HF ``model.generate`` on a GPU
(``/root/reference/src/easyrag/utils/llm_utils.py:58-73``: chat template,
greedy ``top_k=1``, ``max_length=8192``). A literal port would re-trace the
whole prompt every step; the TPU-native design is two static-shape phases:

* **prefill** — one causal forward over the prompt padded LEFT to a length
  bucket, writing each layer's rotary-encoded K/V into a preallocated
  ``[B, S + max_new, kv_heads, head_dim]`` cache. Left padding keeps the
  generated suffix contiguous with the prompt (the same convention the
  MiniCPM reranker path already uses, ``minicpm.py::build_inputs``).
* **decode** — a ``lax.while_loop`` of single-token steps: one row of each
  projection, rotary at the true per-row position (``prompt_len + step``),
  dot-product attention against the cache with a stored validity mask, and
  a greedy argmax over the LM head. The loop exits as soon as every row has
  emitted an EOS, so short answers don't pay for ``max_new_tokens``.

Everything is jittable with static ``(bucket, max_new)`` shapes, so
repeated calls hit XLA's compile cache; the per-layer Python loop unrolls
at trace time (no data-dependent control flow inside the step).

Numerics match :func:`easyrag_tpu.models.layers.forward_hidden` run over
the growing sequence (same primitives, same f32 softmax/norm accumulation);
``tests/test_decode.py`` pins token-sequence equality against that oracle.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .layers import (
    DecoderConfig,
    _linear,
    apply_rope,
    attention_bias_from_mask,
    embed,
    mlp,
    rms_norm,
    rope_tables,
)

Cache = List[Dict[str, jnp.ndarray]]


def init_cache(cfg: DecoderConfig, batch: int, total_len: int) -> Cache:
    """Per-layer K/V buffers, rotary already applied at write time."""
    nkv, hd = cfg.num_key_value_heads, cfg.hd
    return [
        {
            "k": jnp.zeros((batch, total_len, nkv, hd), cfg.dtype),
            "v": jnp.zeros((batch, total_len, nkv, hd), cfg.dtype),
        }
        for _ in range(cfg.num_hidden_layers)
    ]


def _qkv(cfg: DecoderConfig, p: Dict[str, Any], h: jnp.ndarray):
    b, s, _ = h.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    a8 = cfg.act_quant
    if "qkv" in p:
        # int4 fused projection (hf_loader.fuse_decode_tree): one packed
        # matvec dispatch instead of three — the q/k/v column split is a
        # free slice of the same per-output-channel results
        y = _linear(h, p["qkv"], a8)
        qd, kd = nh * hd, nkv * hd
        q = y[..., :qd].reshape(b, s, nh, hd)
        k = y[..., qd : qd + kd].reshape(b, s, nkv, hd)
        v = y[..., qd + kd :].reshape(b, s, nkv, hd)
        return q, k, v
    q = _linear(h, p["q"], a8).reshape(b, s, nh, hd)
    k = _linear(h, p["k"], a8).reshape(b, s, nkv, hd)
    v = _linear(h, p["v"], a8).reshape(b, s, nkv, hd)
    return q, k, v


def _attn_scale(cfg: DecoderConfig) -> float:
    if cfg.query_pre_attn_scalar:
        return cfg.query_pre_attn_scalar ** -0.5
    return cfg.hd ** -0.5


def _prefill_layer(
    cfg: DecoderConfig,
    p: Dict[str, Any],
    x: jnp.ndarray,
    bias: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,  # [B, S] padding mask
    cache: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One decoder layer over the full prompt; K/V land in ``cache[:, :S]``."""
    r = cfg.residual_scale
    h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps, cfg.gemma)
    q, k, v = _qkv(cfg, p["attn"], h)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    s = x.shape[1]
    cache = {
        "k": jax.lax.dynamic_update_slice(cache["k"], k.astype(cfg.dtype), (0, 0, 0, 0)),
        "v": jax.lax.dynamic_update_slice(cache["v"], v.astype(cfg.dtype), (0, 0, 0, 0)),
    }
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    if nkv != nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if (
        cfg.use_flash
        and not cfg.attn_logit_softcapping
        and cfg.hd % 128 == 0
        and s % 128 == 0
    ):
        # long-prompt prefill: the einsum path would materialize the
        # [B, H, S, S] f32 logits (6.6 GB at 7B scale / S=7680); flash
        # keeps the scores tile in VMEM. Left padding rides the segment-id
        # mask (pad id 0, real id 1), causality the kernel's block mask.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        seg = mask.astype(jnp.int32)
        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            segment_ids=SegmentIds(seg, seg),
            causal=True,
            sm_scale=_attn_scale(cfg),
        )
        out = (
            out.transpose(0, 2, 1, 3).reshape(x.shape[0], s, nh * cfg.hd)
            .astype(x.dtype)
        )
    else:
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            * _attn_scale(cfg)
        )
        if cfg.attn_logit_softcapping:
            cap = cfg.attn_logit_softcapping
            logits = jnp.tanh(logits / cap) * cap
        logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(
            x.shape[0], s, nh * cfg.hd
        )
    h = _linear(out, p["attn"]["o"], cfg.act_quant)
    if cfg.gemma:
        h = rms_norm(h, p["post_attn_norm"], cfg.rms_norm_eps, cfg.gemma)
        x = x + h
        h = rms_norm(x, p["pre_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        h = mlp(cfg, p["mlp"], h)
        h = rms_norm(h, p["post_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        return x + h, cache
    x = x + h * r
    h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
    h = mlp(cfg, p["mlp"], h)
    return x + h * r, cache


def _cache_write(
    cache: Dict[str, jnp.ndarray],
    k: jnp.ndarray,  # [B, 1, nkv, hd]
    v: jnp.ndarray,
    pos: jnp.ndarray,  # scalar OR [B] int32
    dtype,
) -> Dict[str, jnp.ndarray]:
    """Write one decode step's K/V into the cache.

    ``pos`` scalar: every row writes the same slot (``generate_greedy``'s
    uniform left-padded layout — one ``dynamic_update_slice``). ``pos``
    [B]: per-row slots (the continuous-batching decode pool, where rows
    joined at different prompt lengths sit at different progress) — one
    batched scatter, negligible next to the weight reads decode is bound
    by."""
    k = k.astype(dtype)
    v = v.astype(dtype)
    if jnp.ndim(pos) == 0:
        return {
            "k": jax.lax.dynamic_update_slice(cache["k"], k, (0, pos, 0, 0)),
            "v": jax.lax.dynamic_update_slice(cache["v"], v, (0, pos, 0, 0)),
        }
    idx = jnp.arange(k.shape[0])
    return {
        "k": cache["k"].at[idx, pos].set(k[:, 0]),
        "v": cache["v"].at[idx, pos].set(v[:, 0]),
    }


def _decode_layer(
    cfg: DecoderConfig,
    p: Dict[str, Any],
    x: jnp.ndarray,  # [B, 1, D]
    pos: jnp.ndarray,  # int32 cache slot(s) being written: scalar or [B]
    kv_mask: jnp.ndarray,  # [B, T] validity of cache slots (incl. this one)
    cos: jnp.ndarray,  # [B, 1, hd]
    sin: jnp.ndarray,
    cache: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    r = cfg.residual_scale
    h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps, cfg.gemma)
    q, k, v = _qkv(cfg, p["attn"], h)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    cache = _cache_write(cache, k, v, pos, cfg.dtype)
    b = x.shape[0]
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    g = nh // nkv
    qg = q.reshape(b, nkv, g, hd)
    # [B, nkv, g, T] attention against every valid cached slot; no causal
    # term needed — the query IS the newest position.
    logits = (
        jnp.einsum("bkgd,btkd->bkgt", qg, cache["k"], preferred_element_type=jnp.float32)
        * _attn_scale(cfg)
    )
    if cfg.attn_logit_softcapping:
        cap = cfg.attn_logit_softcapping
        logits = jnp.tanh(logits / cap) * cap
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(kv_mask[:, None, None, :] > 0, logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bkgt,btkd->bkgd", probs, cache["v"]).reshape(b, 1, nh * hd)
    h = _linear(out, p["attn"]["o"], cfg.act_quant)
    if cfg.gemma:
        h = rms_norm(h, p["post_attn_norm"], cfg.rms_norm_eps, cfg.gemma)
        x = x + h
        h = rms_norm(x, p["pre_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        h = mlp(cfg, p["mlp"], h)
        h = rms_norm(h, p["post_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        return x + h, cache
    x = x + h * r
    h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
    h = mlp(cfg, p["mlp"], h)
    return x + h * r, cache


def _lm_logits(cfg: DecoderConfig, params: Dict[str, Any], h: jnp.ndarray) -> jnp.ndarray:
    """Final-normed hidden [B, D] -> vocab logits [B, V] (f32)."""
    if cfg.dim_model_base:  # MiniCPM logit scaling (SURVEY §2: layers.py note)
        h = h / (cfg.hidden_size / cfg.dim_model_base)
    head = params.get("lm_head")
    if head is None:  # tied embeddings (Qwen2-0.5B/1.5B, MiniCPM, Gemma)
        emb = params["embed"]
        head = emb if isinstance(emb, dict) else {"w": emb}  # int8 table
        # doubles as an int8 per-channel head (_linear's w_q form)
    elif not isinstance(head, dict):  # hf_loader stores the plain CausalLM
        head = {"w": head}  # head as a raw [V, D] array
    return _linear(h, head).astype(jnp.float32)


def _prefill(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,  # [B, S] LEFT-padded
    attention_mask: jnp.ndarray,  # [B, S]
    cache: Cache,
) -> Tuple[jnp.ndarray, Cache]:
    b, s = input_ids.shape
    # left padding: real tokens occupy the suffix; their rotary positions
    # count from 0 at the first real token
    lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)  # [B]
    positions = jnp.maximum(
        jnp.arange(s, dtype=jnp.int32)[None, :] - (s - lengths)[:, None], 0
    )
    cos, sin = rope_tables(positions, cfg.hd, cfg.rope_theta)
    flash = (
        cfg.use_flash
        and not cfg.attn_logit_softcapping
        and cfg.hd % 128 == 0
        and s % 128 == 0
    )
    # the [B, 1, S, S] f32 bias is only needed by the einsum fallback
    bias = None if flash else attention_bias_from_mask(attention_mask)
    h = embed(cfg, params, input_ids)
    new_cache: Cache = []
    for idx in range(cfg.num_hidden_layers):
        h, c = _prefill_layer(
            cfg, params["layers"][idx], h, bias, cos, sin, attention_mask,
            cache[idx],
        )
        new_cache.append(c)
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps, cfg.gemma)
    return h[:, -1], new_cache  # left-pad => last slot is the last real token


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def generate_greedy(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,  # [B, S] LEFT-padded int32
    attention_mask: jnp.ndarray,  # [B, S] int32
    eos_ids: jnp.ndarray,  # [E] int32 (pad with repeats)
    max_new_tokens: int,
    limit: Optional[jnp.ndarray] = None,  # dynamic step cap (<= max_new)
    active: Optional[jnp.ndarray] = None,  # [B] bool; False rows emit EOS only
) -> jnp.ndarray:
    """Greedy decode (the reference's ``top_k=1``/``do_sample=False``).

    Returns ``[B, max_new_tokens]`` int32; positions after a row's EOS are
    filled with the EOS id. The emitted EOS itself is kept so callers can
    split on it.

    ``limit`` is a TRACED scalar bound on decode steps — shapes (and thus
    the compiled program) stay keyed on the static ``max_new_tokens``, so a
    ``limit=1`` call compiles the exact executable later full-length calls
    reuse (the warmup trick). ``active`` marks batch-padding rows as
    already-done so they never hold the all-rows-EOS early exit hostage.
    """
    b, s = input_ids.shape
    t_total = s + max_new_tokens
    cache = init_cache(cfg, b, t_total)
    lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)
    h_last, cache = _prefill(cfg, params, input_ids, attention_mask, cache)
    first = jnp.argmax(_lm_logits(cfg, params, h_last), axis=-1).astype(jnp.int32)

    kv_mask0 = jnp.concatenate(
        [attention_mask.astype(jnp.int32), jnp.zeros((b, max_new_tokens), jnp.int32)],
        axis=1,
    )
    out0 = jnp.full((b, max_new_tokens), eos_ids[0], jnp.int32)
    done0 = jnp.zeros((b,), bool) if active is None else ~active
    step_cap = (
        jnp.int32(max_new_tokens)
        if limit is None
        else jnp.minimum(limit.astype(jnp.int32), max_new_tokens)
    )

    def cond(carry):
        step, _, _, _, done, _ = carry
        return jnp.logical_and(step < step_cap, ~jnp.all(done))

    def body(carry):
        step, tok, kv_mask, out, done, cache = carry
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(done, eos_ids[0], tok)[:, None], (0, step)
        )
        done = jnp.logical_or(done, jnp.any(tok[:, None] == eos_ids[None, :], axis=1))
        pos = s + step  # uniform cache slot (left padding)
        kv_mask = jax.lax.dynamic_update_slice(
            kv_mask, (~done).astype(jnp.int32)[:, None], (0, pos)
        )
        rope_pos = (lengths + step)[:, None]  # true per-row position
        cos, sin = rope_tables(rope_pos, cfg.hd, cfg.rope_theta)
        h = embed(cfg, params, tok[:, None])
        new_cache: Cache = []
        for idx in range(cfg.num_hidden_layers):
            h, c = _decode_layer(
                cfg, params["layers"][idx], h, pos, kv_mask, cos, sin, cache[idx]
            )
            new_cache.append(c)
        h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps, cfg.gemma)
        nxt = jnp.argmax(_lm_logits(cfg, params, h[:, 0]), axis=-1).astype(jnp.int32)
        return step + 1, nxt, kv_mask, out, done, new_cache

    carry = (jnp.int32(0), first, kv_mask0, out0, done0, cache)
    step, tok, kv_mask, out, done, cache = jax.lax.while_loop(cond, body, carry)
    # the loop exits before writing the final token of rows that never hit
    # EOS at step == max_new_tokens - 1; the last body iteration always
    # writes tok at its step first, so `out` is complete on exit.
    return out


def _verify_layer(
    cfg: DecoderConfig,
    p: Dict[str, Any],
    x: jnp.ndarray,  # [B, Q, D] — the draft block (Q = draft_len + 1)
    slots: jnp.ndarray,  # [B, Q] int32 cache slots these tokens occupy
    allowed: jnp.ndarray,  # [B, Q, T] bool attention visibility
    cos: jnp.ndarray,  # [B, Q, hd]
    sin: jnp.ndarray,
    cache: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One decoder layer over a speculative verify block.

    Like :func:`_decode_layer` but with Q>1 query positions that are causal
    among themselves (the ``allowed`` mask encodes both the cache validity
    and the intra-block causal triangle). K/V for ALL Q positions are
    scattered into the cache up front; rejected suffix slots are simply
    never marked valid and get overwritten by the next block.
    """
    r = cfg.residual_scale
    h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps, cfg.gemma)
    q, k, v = _qkv(cfg, p["attn"], h)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    b_idx = jnp.arange(x.shape[0])[:, None]
    cache = {
        "k": cache["k"].at[b_idx, slots].set(k.astype(cfg.dtype), mode="drop"),
        "v": cache["v"].at[b_idx, slots].set(v.astype(cfg.dtype), mode="drop"),
    }
    b, qn = x.shape[0], x.shape[1]
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    g = nh // nkv
    qg = q.reshape(b, qn, nkv, g, hd)
    logits = (
        jnp.einsum(
            "bqkgd,btkd->bkgqt", qg, cache["k"],
            preferred_element_type=jnp.float32,
        )
        * _attn_scale(cfg)
    )
    if cfg.attn_logit_softcapping:
        cap = cfg.attn_logit_softcapping
        logits = jnp.tanh(logits / cap) * cap
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(allowed[:, None, None, :, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = (
        jnp.einsum("bkgqt,btkd->bqkgd", probs, cache["v"])
        .reshape(b, qn, nh * hd)
    )
    h = _linear(out, p["attn"]["o"], cfg.act_quant)
    if cfg.gemma:
        h = rms_norm(h, p["post_attn_norm"], cfg.rms_norm_eps, cfg.gemma)
        x = x + h
        h = rms_norm(x, p["pre_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        h = mlp(cfg, p["mlp"], h)
        h = rms_norm(h, p["post_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        return x + h, cache
    x = x + h * r
    h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
    h = mlp(cfg, p["mlp"], h)
    return x + h * r, cache


def _ngram_draft(
    buf: jnp.ndarray,  # [B, L] token history (prompt left-padded + emitted)
    start: jnp.ndarray,  # [B] first valid buf index (s - prompt_len)
    end: jnp.ndarray,  # [B] one past the last valid index (s + n)
    ngram: int,
    draft_len: int,
) -> jnp.ndarray:
    """Prompt-lookup drafts: copy the ``draft_len`` tokens that followed the
    most recent earlier occurrence of the sequence's trailing ``ngram``.

    The valid region of ``buf`` is one contiguous range per row (left-padded
    prompt abuts the emitted suffix), so window validity is pure index
    arithmetic — no mask materialization. Rows with no match draft garbage
    (clamped gathers); the verify step rejects wrong drafts anyway, so the
    draft source only affects speed, never output.
    """
    b, l = buf.shape
    rows = jnp.arange(b)[:, None]
    key = buf[rows, jnp.clip(end[:, None] - ngram + jnp.arange(ngram), 0, l - 1)]
    pos = jnp.arange(l)[None, :]  # window END index i
    match = jnp.ones((b, l), bool)
    for j in range(ngram):
        shifted = jnp.pad(buf, ((0, 0), (j, 0)))[:, :l]  # buf[:, i - j]
        match &= shifted == key[:, ngram - 1 - j][:, None]
    match &= pos - (ngram - 1) >= start[:, None]  # window inside valid range
    # the whole draft window must be inside the valid region too (also
    # excludes the trailing key itself): a periodic tail's most recent
    # match otherwise sits AT the frontier and drafts unwritten fill —
    # e.g. a period-1 loop would cap acceptance at 1 instead of hitting
    # the run deeper in
    match &= pos <= end[:, None] - 1 - draft_len
    best = jnp.max(jnp.where(match, pos, -1), axis=1)  # [B] (-1 = no match)
    src = jnp.clip(best[:, None] + 1 + jnp.arange(draft_len), 0, l - 1)
    return buf[rows, src]  # [B, draft_len]


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "draft_len", "ngram")
)
def generate_greedy_spec(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,  # [B, S] LEFT-padded int32
    attention_mask: jnp.ndarray,  # [B, S] int32
    eos_ids: jnp.ndarray,  # [E] int32
    max_new_tokens: int,
    draft_len: int = 7,
    ngram: int = 2,
    limit: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Greedy decode with prompt-lookup speculative verification.

    Bit-identical outputs to :func:`generate_greedy` (greedy acceptance is
    exact: a draft token is kept only when it equals the model's own argmax
    at that position), but each ``while_loop`` iteration verifies a block of
    ``draft_len`` drafted tokens in ONE forward over ``draft_len + 1``
    positions. Decode is weight-bandwidth-bound (BASELINE.md: every step
    re-reads the whole parameter tree), so the block forward costs about the
    same as a single-token step — accepted drafts are nearly free tokens.

    Drafts come from the sequence itself (prompt + generated so far): the
    continuation of the most recent earlier occurrence of the trailing
    ``ngram``. For RAG the prompt *contains the retrieved context*, and
    grounded answers largely copy spans from it — the regime prompt-lookup
    was designed for. No draft model, no extra weights, no training.

    Rows accept different draft counts, so progress is per-row: cache write
    slots, rope positions, and output offsets all carry a [B] position
    vector (the same generalization the continuous-batching pool uses).
    """
    b, s = input_ids.shape
    k1 = draft_len + 1
    t_total = s + max_new_tokens
    cache = init_cache(cfg, b, t_total)
    lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)
    h_last, cache = _prefill(cfg, params, input_ids, attention_mask, cache)
    first = jnp.argmax(_lm_logits(cfg, params, h_last), axis=-1).astype(jnp.int32)

    done0 = jnp.zeros((b,), bool) if active is None else ~active
    first = jnp.where(done0, eos_ids[0], first)
    step_cap = (
        jnp.int32(max_new_tokens)
        if limit is None
        else jnp.minimum(limit.astype(jnp.int32), max_new_tokens)
    )
    # token history: prompt (left-padded) + emitted tokens; `first` is the
    # 0th emitted token, so n starts at 1 with buf[s] = first
    buf0 = jnp.concatenate(
        [input_ids, jnp.full((b, max_new_tokens), eos_ids[0], jnp.int32)], axis=1
    )
    buf0 = buf0.at[:, s].set(first)
    n0 = jnp.ones((b,), jnp.int32)
    is_eos = lambda t: jnp.any(t[..., None] == eos_ids[None, :], axis=-1)
    done0 = jnp.logical_or(done0, is_eos(first))
    done0 = jnp.logical_or(done0, n0 >= step_cap)
    # kv validity: prompt slots from prefill; emitted tokens' K/V are written
    # by the verify block that consumes them (`last` rides un-cached)
    kv_mask0 = jnp.concatenate(
        [attention_mask.astype(jnp.int32), jnp.zeros((b, max_new_tokens), jnp.int32)],
        axis=1,
    )
    start = s - lengths  # first valid buf index per row

    def cond(carry):
        _, _, done, _, _ = carry
        return ~jnp.all(done)

    def body(carry):
        n, buf, done, kv_mask, cache = carry
        last = buf[jnp.arange(b), jnp.clip(s + n - 1, 0, t_total - 1)]
        draft = _ngram_draft(buf, start, s + n, ngram, draft_len)
        tokens_in = jnp.concatenate([last[:, None], draft], axis=1)  # [B, K+1]
        cur = s + n - 1  # cache slot of `last` = its sequence index
        slots = cur[:, None] + jnp.arange(k1)[None, :]
        rope_pos = (lengths + n - 1)[:, None] + jnp.arange(k1)[None, :]
        cos, sin = rope_tables(rope_pos, cfg.hd, cfg.rope_theta)
        # visibility: all valid cache slots + the block's causal triangle
        t_idx = jnp.arange(t_total)[None, None, :]
        allowed = (kv_mask[:, None, :] > 0) | (
            (t_idx >= cur[:, None, None]) & (t_idx <= slots[:, :, None])
        )
        h = embed(cfg, params, tokens_in)
        new_cache: Cache = []
        for idx in range(cfg.num_hidden_layers):
            h, c = _verify_layer(
                cfg, params["layers"][idx], h, slots, allowed, cos, sin,
                cache[idx],
            )
            new_cache.append(c)
        h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps, cfg.gemma)
        preds = jnp.argmax(
            _lm_logits(cfg, params, h), axis=-1
        ).astype(jnp.int32)  # [B, K+1]; preds[:, j] follows tokens_in[:, :j+1]
        # greedy acceptance: leading run of draft[j] == preds[j]
        acc = jnp.sum(
            jnp.cumprod((draft == preds[:, :-1]).astype(jnp.int32), axis=1),
            axis=1,
        )
        # emitted this iteration: preds[:, :m]; truncate at the first EOS
        # and at the step cap; done rows emit nothing
        hit = is_eos(preds)
        first_eos = jnp.min(
            jnp.where(hit, jnp.arange(k1)[None, :], k1), axis=1
        )
        m = jnp.minimum(jnp.minimum(acc + 1, first_eos + 1), step_cap - n)
        m = jnp.where(done, 0, m)
        j_idx = jnp.arange(k1)[None, :]
        emit = j_idx < m[:, None]
        dst = jnp.where(emit, (s + n)[:, None] + j_idx, t_total)  # drop OOB
        buf = buf.at[jnp.arange(b)[:, None], dst].set(preds, mode="drop")
        # kv validity: the block's slots hold K/V for [last, draft...]; the
        # accepted prefix of length m covers sequence indices cur..cur+m-1
        kv_dst = jnp.where(emit, cur[:, None] + j_idx, t_total)
        kv_mask = kv_mask.at[jnp.arange(b)[:, None], kv_dst].set(1, mode="drop")
        n = n + m
        done = done | (m > 0) & (first_eos < m) | (n >= step_cap)
        return n, buf, done, kv_mask, new_cache

    carry = (n0, buf0, done0, kv_mask0, cache)
    n, buf, done, kv_mask, cache = jax.lax.while_loop(cond, body, carry)
    gen = buf[:, s:]
    return jnp.where(
        jnp.arange(max_new_tokens)[None, :] < n[:, None], gen, eos_ids[0]
    )


def _pad_left(
    ids: Sequence[int], bucket: int, pad_id: int
) -> Tuple[List[int], List[int]]:
    pad = bucket - len(ids)
    return [pad_id] * pad + list(ids), [0] * pad + [1] * len(ids)


class JaxCausalLM:
    """Local TPU generation backend for the pipeline's ``local_llm`` option.

    Parity target: ``/root/reference/src/easyrag/utils/llm_utils.py:58-73``
    (chat template, greedy, ``max_length=8192``) — but the forward is the
    shared JAX decoder with an int8-quantizable weight tree streamed by
    ``hf_loader``, and decoding is :func:`generate_greedy`'s static-shape
    prefill+KV-cache loop instead of HF's per-step re-dispatch.
    """

    MAX_LENGTH = 8192  # reference cap (llm_utils.py:66)

    def __init__(
        self,
        model_dir: str,
        dtype=jnp.bfloat16,
        quant: str = "int8",
        max_new_tokens: Optional[int] = None,
        buckets: Sequence[int] = (256, 512, 1024, 2048, 4096, 7680),
        max_batch: int = 8,
        spec_tokens: int = 0,
        spec_ngram: int = 2,
    ) -> None:
        import dataclasses
        import json
        import os

        from transformers import AutoTokenizer

        from .hf_loader import load_decoder_params, load_hf_config
        from .qwen2 import qwen2_config_from_hf
        from .registry import _require_local

        model_dir = _require_local(model_dir, "local LLM")
        hf = load_hf_config(model_dir)
        self.cfg = qwen2_config_from_hf(hf, dtype=dtype)
        if quant in ("w8a8", "w4a8"):
            self.cfg = dataclasses.replace(self.cfg, act_quant=True)
        if jax.default_backend() != "cpu" and self.cfg.hd % 128 == 0:
            # long-prompt prefill must run the flash kernel (the einsum
            # fallback materializes [B,H,S,S] f32 logits — 6.6 GB at 7B
            # scale / S=7680); same gate as registry.py's model loads
            self.cfg = dataclasses.replace(self.cfg, use_flash=True)
        self.params = load_decoder_params(
            model_dir, self.cfg.num_hidden_layers, dtype=dtype, quant=quant
        )
        if quant in ("int4", "w4a8"):
            # fuse q+k+v / gate+up packed matvecs: 196 -> 112 kernel
            # dispatches per decode step, identical per-channel math
            # (hf_loader.fuse_decode_tree)
            from .hf_loader import fuse_decode_tree

            self.params = fuse_decode_tree(self.params)
        self.tokenizer = AutoTokenizer.from_pretrained(
            model_dir, trust_remote_code=True
        )
        # HF generate (the parity target) honors generation_config.json's
        # EOS list on top of config.json (Qwen2-7B-Instruct declares
        # [151643, 151645] there but only 151645 in config.json)
        eos = hf.get("eos_token_id", self.tokenizer.eos_token_id)
        eos_ids = [eos] if isinstance(eos, int) else list(eos)
        gen_cfg_path = os.path.join(model_dir, "generation_config.json")
        if os.path.exists(gen_cfg_path):
            with open(gen_cfg_path) as f:
                g = json.load(f).get("eos_token_id")
            for e in [g] if isinstance(g, int) else (g or []):
                if e not in eos_ids:
                    eos_ids.append(e)
        self.eos_ids = eos_ids
        # None -> generate until total length MAX_LENGTH (the reference's
        # ``max_length=8192`` semantics); an int caps new tokens
        self.max_new_tokens = max_new_tokens
        self.buckets = tuple(sorted(buckets))
        # batched-generation cap: the KV cache costs
        # 2*layers*kv_heads*head_dim*dtype bytes per (row, token slot) —
        # ~56 KB/slot at Qwen2-7B, so B=8 at the 7680 bucket is ~3.5 GB of
        # transient HBM next to the resident tenants
        self.max_batch = max_batch
        # prompt-lookup speculative decoding (generate_greedy_spec):
        # spec_tokens drafts verified per step, 0 = plain decode
        self.spec_tokens = spec_tokens
        self.spec_ngram = spec_ngram

    # -- prompt <-> token plumbing shared by the single and batched paths --

    def _encode(self, query: str) -> List[int]:
        ids = self.tokenizer.apply_chat_template(
            [{"role": "user", "content": query}], add_generation_prompt=True
        )
        # the prompt can never exceed the largest bucket, and must leave
        # room for at least one generated token
        cap = min(self.buckets[-1], self.MAX_LENGTH - 1)
        if self.max_new_tokens is not None:
            cap = min(cap, self.MAX_LENGTH - self.max_new_tokens)
        return list(ids[-cap:])

    def _bucket_max_new(self, bucket: int) -> int:
        max_new = self.MAX_LENGTH - bucket
        if self.max_new_tokens is not None:
            max_new = min(self.max_new_tokens, max_new)
        return max_new

    def _decode_row(self, toks: List[int]) -> str:
        # truncate at the EARLIEST eos occurrence (any of the ids)
        cut = min((toks.index(e) for e in self.eos_ids if e in toks), default=None)
        if cut is not None:
            toks = toks[:cut]
        return self.tokenizer.decode(toks, skip_special_tokens=True)

    def _run_group(
        self, rows: List[List[int]], masks: List[List[int]],
        max_new: int, n_real: int, limit: Optional[int] = None,
    ) -> jnp.ndarray:
        """One ``generate_greedy`` dispatch. ``limit``/``active`` always ride
        as TRACED arrays so every entry point (single, batched, warmup)
        shares one compiled executable per (bucket, B, max_new)."""
        b = len(rows)
        active = jnp.arange(b) < n_real
        if self.spec_tokens:
            # warmup's limit=1 would finish before the first verify block
            # (the prefill token already counts as one emitted); limit=2
            # compiles the verify executable too
            if limit is not None:
                limit = max(limit, 2)
            return generate_greedy_spec(
                self.cfg,
                self.params,
                jnp.asarray(rows, jnp.int32),
                jnp.asarray(masks, jnp.int32),
                jnp.asarray(self.eos_ids, jnp.int32),
                max_new,
                draft_len=self.spec_tokens,
                ngram=self.spec_ngram,
                limit=jnp.int32(max_new if limit is None else limit),
                active=active,
            )
        return generate_greedy(
            self.cfg,
            self.params,
            jnp.asarray(rows, jnp.int32),
            jnp.asarray(masks, jnp.int32),
            jnp.asarray(self.eos_ids, jnp.int32),
            max_new,
            limit=jnp.int32(max_new if limit is None else limit),
            active=active,
        )

    def generate(self, query: str) -> str:
        return self.generate_batch([query])[0]

    def generate_batch(self, queries: Sequence[str]) -> List[str]:
        """Batched greedy generation for concurrent requests.

        Decode is weight-bandwidth-bound: every step re-reads the whole
        parameter tree, so rows added to a step are nearly free (measured
        +4% step cost at B=8 vs B=1, BASELINE.md) — batching concurrent
        requests is ~linear serving throughput on the generation stage.
        Prompts group by length bucket; each group pads its batch dim to a
        power of two (``active`` masks the padding rows, which start done
        and never delay the all-rows-EOS exit) and dispatches once.
        """
        encs = [self._encode(q) for q in queries]
        groups: Dict[int, List[int]] = {}
        for i, ids in enumerate(encs):
            bucket = next(b for b in self.buckets if len(ids) <= b)
            groups.setdefault(bucket, []).append(i)
        pad_id = self.tokenizer.pad_token_id or self.eos_ids[0]
        out: List[Optional[str]] = [None] * len(queries)
        for bucket, idxs in groups.items():
            max_new = self._bucket_max_new(bucket)
            dummy = _pad_left([self.eos_ids[0]], bucket, pad_id)
            for lo in range(0, len(idxs), self.max_batch):
                chunk = idxs[lo : lo + self.max_batch]
                b = 1 << (len(chunk) - 1).bit_length()  # pad B to a pow2
                rows = [_pad_left(encs[i], bucket, pad_id) for i in chunk]
                rows += [dummy] * (b - len(chunk))
                toks = self._run_group(
                    [r for r, _ in rows], [m for _, m in rows],
                    max_new, n_real=len(chunk),
                )
                for j, i in enumerate(chunk):
                    out[i] = self._decode_row(list(toks[j].tolist()))
        return out  # type: ignore[return-value]

    def plan_groups(self, queries: Sequence[str]) -> List[Tuple[int, int]]:
        """The (bucket, group_size) dispatch plan ``generate_batch`` would
        use for ``queries`` — same encode + bucket walk, no device work.
        Serving warmup uses this to discover which executables a recorded
        request mix can actually reach (an unwarmed pair is a multi-minute
        cold compile inside the timed window)."""
        groups: Dict[int, int] = {}
        for q in queries:
            ids = self._encode(q)
            bucket = next(b for b in self.buckets if len(ids) <= b)
            groups[bucket] = groups.get(bucket, 0) + 1
        return sorted(groups.items())

    def warmup(
        self,
        buckets: Optional[Sequence[int]] = None,
        batch_sizes: Sequence[int] = (1,),
        pairs: Optional[Sequence[Tuple[int, int]]] = None,
    ) -> None:
        """Pre-compile the (bucket, B) executables off the request path.

        Cold 7B compiles cost tens of seconds each on a remote attachment
        (measured as the p99 spike in the serving bench); a ``limit=1``
        call compiles the exact full-length executable — the static shape
        key is ``(bucket, B, max_new)`` — while running only prefill plus
        one decode step. ``pairs`` warms an explicit (bucket, B) list
        (recorded-warmup boot); otherwise the ``buckets`` × ``batch_sizes``
        product is warmed.
        """
        if pairs is not None:
            work = [(bk, (b,)) for bk, b in pairs]
        else:
            work = [(bk, tuple(batch_sizes)) for bk in (buckets or self.buckets)]
        pad_id = self.tokenizer.pad_token_id or self.eos_ids[0]
        for bucket, sizes in work:
            bucket = next(b for b in self.buckets if bucket <= b)
            max_new = self._bucket_max_new(bucket)
            dummy = _pad_left([self.eos_ids[0]], bucket, pad_id)
            for b in sizes:
                rows = [dummy] * b
                res = self._run_group(
                    [r for r, _ in rows], [m for _, m in rows],
                    max_new, n_real=b, limit=1,
                )
                res.block_until_ready()
