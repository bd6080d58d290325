"""Functional decoder-transformer core shared by the model family.

One parameterized forward covers the three vendored-model architectures the
reference carries (all llama-family decoders with small deltas):

* Qwen2 / gte-Qwen2-7B-instruct (``src/easyrag/utils/modeling_qwen.py``):
  QKV bias, no scaling quirks.
* MiniCPM / bge-reranker-v2-minicpm-layerwise
  (``src/easyrag/utils/modeling_minicpm_reranker.py``): embeddings scaled by
  ``scale_emb``, residual branches scaled by ``scale_depth/sqrt(L)``
  (:820,:827), logits read from ``hidden / (hidden_size/dim_model_base)``.
* Gemma2 / bge-reranker-v2.5-gemma2-lightweight
  (``src/easyrag/utils/gemma_model.py``): GeGLU, pre+post layernorms, logit
  softcap — handled in ``gemma.py`` with the same primitives.

Design (TPU-first): parameters live in a flat pytree of jnp arrays (easy to
shard with ``NamedSharding``); the forward is pure and jit-friendly (static
shapes, f32 softmax/norm accumulation, bf16 matmuls on the MXU); attention
is a single fused-by-XLA einsum chain with a combined causal+padding bias.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    attention_bias: bool = False  # True for Qwen2 QKV
    # MiniCPM mup-style scalings (1.0 = disabled)
    scale_emb: float = 1.0
    scale_depth: float = 0.0  # 0.0 -> plain residual (scale 1)
    dim_model_base: float = 0.0  # 0.0 -> no logit scaling
    # Gemma deltas
    gemma: bool = False  # geglu activation + extra norms + emb scale sqrt(d)
    attn_logit_softcapping: float = 0.0
    query_pre_attn_scalar: float = 0.0
    # use the Pallas flash-attention kernel (TPU only; requires seq % 128
    # == 0 and no logit softcap — falls back to the einsum path otherwise)
    use_flash: bool = False
    # flash block sizes (block_q, block_k); None -> per-head_dim defaults
    # (measured on v5e, tools/bench_attn64.py): head_dim%128 -> kernel
    # defaults; head_dim 64 -> (384, seq) when seq%384==0 else (128, 128)
    flash_blocks: Optional[Tuple[int, int]] = None
    # w8a8: quantize activations per-token to int8 at every projection so
    # the s8 x s8 contraction runs at the MXU's double int8 rate. Requires
    # int8 weights (quant="w8a8" at load); opt-in — small rounding error
    act_quant: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def residual_scale(self) -> float:
        if self.scale_depth:
            return self.scale_depth / (self.num_hidden_layers ** 0.5)
        return 1.0


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float, gemma: bool = False) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if gemma:  # gemma parameterizes the gain as (1 + w)
        w = 1.0 + w
    return (normed * w).astype(x.dtype)


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the rotate-half RoPE convention, f32.

    positions: [B, S] int32 -> ([B, S, head_dim], [B, S, head_dim]).
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [B, S, head_dim]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, D]; cos/sin: [B, S, D]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (
        x.astype(jnp.float32) * cos[:, :, None, :]
        + rotated.astype(jnp.float32) * sin[:, :, None, :]
    ).astype(x.dtype)


def attention_bias_from_mask(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, S] padding mask -> [B, 1, S, S] additive causal+padding bias."""
    seq = attention_mask.shape[-1]
    causal = jnp.tril(jnp.ones((seq, seq), dtype=bool))
    keep = causal[None, None, :, :] & (attention_mask[:, None, None, :] > 0)
    return jnp.where(keep, 0.0, jnp.finfo(dtype).min).astype(dtype)


def _linear(
    x: jnp.ndarray, p: Dict[str, jnp.ndarray], a8: bool = False
) -> jnp.ndarray:
    if "w_p" in p:
        # int4 weight-only (nibble-packed halves layout, per-output-channel
        # scales, hf_loader.quantize_linear_int4). Decode shapes (few rows)
        # go through the Pallas in-VMEM unpack matvec so HBM sees only the
        # packed bytes (ops/int4_matvec.py); large-row shapes (prefill,
        # compute-bound) and the CPU backend use the XLA unpack, whose
        # materialized int8 copy is amortized by the matmul FLOPs there.
        from ..ops import int4_matvec as i4

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        n_out, half_in = p["w_p"].shape
        # the kernel skips activation quant (decode is bandwidth-bound);
        # the XLA fallback must mirror that at the SAME shapes so w4a8
        # computes one function on every backend (advisor r4: CPU used to
        # a8-quantize decode rows the TPU kernel ran in bf16)
        kernel_shape = i4.supported(rows, n_out, half_in)
        if jax.default_backend() == "tpu" and kernel_shape:
            y2 = i4.int4_matvec(
                x.reshape(rows, x.shape[-1]), p["w_p"], p["scale"]
            )
            y = y2.reshape(*x.shape[:-1], n_out)
        else:
            from .hf_loader import unpack_int4

            w = unpack_int4(p["w_p"])
            if a8 and not kernel_shape:
                # w4a8 (prefill shapes): the unpacked nibble values are
                # already s8, so dynamic per-token activation quant buys
                # the MXU's 2x s8 x s8 rate exactly like the w8a8 path —
                # int4 storage with w8a8 prefill compute. Decode shapes
                # take the kernel above instead (bandwidth-bound; act
                # quant is irrelevant there).
                xf = x.astype(jnp.float32)
                amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
                xs = jnp.where(amax > 0, amax, 1.0) / 127.0
                x_q = jnp.round(xf / xs).astype(jnp.int8)
                y = jax.lax.dot_general(
                    x_q,
                    w,
                    dimension_numbers=(((x_q.ndim - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = (y.astype(jnp.float32) * xs * p["scale"]).astype(x.dtype)
            else:
                y = (x @ w.T.astype(x.dtype)) * p["scale"].astype(x.dtype)
        if "b" in p:
            y = y + p["b"]
        return y
    if "w_q" in p:
        if a8:
            # w8a8: dynamic per-token symmetric activation quant feeding an
            # s8 x s8 -> s32 contraction — the MXU runs int8 at 2x the bf16
            # rate (v5e: 394 vs 197 TOPS). The per-token amax is a cheap
            # VPU reduce; both scale vectors factor out of the contraction
            # and apply once to the s32 result (rank-1 outer rescale).
            # Opt-in (cfg.act_quant): ~0.4% per-op rounding error vs the
            # weight-only path, measured rank-stable at the model level
            # (tests/test_w8a8.py).
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.where(amax > 0, amax, 1.0) / 127.0
            x_q = jnp.round(xf / xs).astype(jnp.int8)
            y = jax.lax.dot_general(
                x_q,
                p["w_q"],
                dimension_numbers=(((x_q.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * xs * p["scale"]).astype(x.dtype)
        else:
            # int8 weight-only (per-output-channel scales, hf_loader.
            # quantize_linear_int8): cast-to-activation-dtype matmul with
            # the dequant fused as a column rescale — XLA folds it into the
            # matmul epilogue
            y = (x @ p["w_q"].T.astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


def _softcap_flash_ok(s: int, hd: int, g: int) -> bool:
    from easyrag_tpu.ops.flash_softcap import supported

    return supported(s, hd, g)


def attention(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    x: jnp.ndarray,  # [B, S, D]
    bias: jnp.ndarray,  # [B, 1, S, S]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # [B, S] padding mask (flash path)
) -> jnp.ndarray:
    b, s, _ = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    a8 = cfg.act_quant
    if "qkv" in params:
        # int4 fused projection (hf_loader.fuse_decode_tree): one packed
        # dispatch; the q/k/v column split is a free slice
        y = _linear(x, params["qkv"], a8)
        qd, kd = nh * hd, nkv * hd
        q = y[..., :qd].reshape(b, s, nh, hd)
        k = y[..., qd : qd + kd].reshape(b, s, nkv, hd)
        v = y[..., qd + kd :].reshape(b, s, nkv, hd)
    else:
        q = _linear(x, params["q"], a8).reshape(b, s, nh, hd)
        k = _linear(x, params["k"], a8).reshape(b, s, nkv, hd)
        v = _linear(x, params["v"], a8).reshape(b, s, nkv, hd)
    scale = (
        cfg.query_pre_attn_scalar ** -0.5 if cfg.query_pre_attn_scalar else hd ** -0.5
    )

    # flash applicability (all measured, see BASELINE.md / tools/bench_attn64*):
    # head_dim 128 models run well at default block sizes from seq 128;
    # head_dim 64 models want LARGE blocks — on v5e at B32xH36xS1152:
    # blocks 128 -> 37 ms/op, 384x1152 -> 9.9 ms/op, einsum -> 21 ms/op.
    flash_ok = (
        cfg.use_flash
        and mask is not None
        and not cfg.attn_logit_softcapping
        and hd % 64 == 0
    )
    # flash64 handles any sublane-aligned (x8) sequence — the reference's
    # exact pad-to-x8 convention; the stock jax flash path needs s % 128.
    if flash_ok and hd == 64 and nh % 2 == 0 and nkv == nh and s % 8 == 0:
        # custom head_dim-64 kernel (ops/flash64.py): head pairs packed in
        # the lane dimension straight from the [B,S,H*64] hidden layout —
        # no transposes; 6.3 ms/op vs stock flash's 9.9 at the reranker
        # shape. Requires a left-pad mask, which is the only padding
        # convention of the head_dim-64 model family here (the MiniCPM
        # reranker, minicpm.py::build_inputs). With batch-shared positions
        # (cos shape [1,S,D], the default arange), RoPE runs inside the
        # kernel — the host-side formulation costs 3-4 ms of HBM passes per
        # q/k per layer at the operating shape.
        from easyrag_tpu.ops.flash64 import flash64_attention

        if cos.shape[0] == 1:
            qf, kf = q, k
            rope_kw = {"cos": cos[0], "sin": sin[0]}
        else:  # per-row positions: rope on host, kernel without rope
            qf = apply_rope(q, cos, sin)
            kf = apply_rope(k, cos, sin)
            rope_kw = {}
        out = flash64_attention(
            qf.reshape(b, s, nh * hd),
            kf.reshape(b, s, nh * hd),
            v.reshape(b, s, nh * hd),
            mask,
            sm_scale=scale,
            block_q=(
                cfg.flash_blocks[0]
                if cfg.flash_blocks and s % cfg.flash_blocks[0] == 0
                else None
            ),
            **rope_kw,
        )
        return _linear(out.astype(x.dtype), params["o"], a8)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if (
        cfg.use_flash
        and cfg.attn_logit_softcapping
        and mask is not None
        and hd % 128 == 0
        and nh % nkv == 0
        and s % 8 == 0
        and _softcap_flash_ok(s, hd, nh // nkv)
    ):
        # softcap-capable fused kernel (ops/flash_softcap.py): applies
        # tanh(l/c)*c inside the VMEM tile, GQA-native (no KV repeat).
        # RIGHT-padding contract: zeros in `mask` must form a suffix —
        # causality then excludes pad keys for every real row, and pad
        # rows' outputs are garbage-but-finite exactly like the einsum
        # path's. The only softcap family here is the Gemma2 reranker,
        # whose token compression already enforces right padding
        # (models/gemma.py::build_inputs).
        from easyrag_tpu.ops.flash_softcap import flash_softcap_attention

        out = flash_softcap_attention(
            q.reshape(b, s, nh * hd),
            k.reshape(b, s, nkv * hd),
            v.reshape(b, s, nkv * hd),
            num_heads=nh,
            num_kv_heads=nkv,
            sm_scale=scale,
            softcap=cfg.attn_logit_softcapping,
            block_q=cfg.flash_blocks[0] if cfg.flash_blocks else None,
        )
        return _linear(out.astype(x.dtype), params["o"], a8)

    if nkv != nh:  # grouped-query attention: broadcast KV over query groups
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    if flash_ok and s % 128 == 0:
        # Pallas flash attention: the (S, S) scores tile never touches HBM.
        # Padding rides the segment-id mask (pad tokens get id 0, real id 1,
        # so neither side attends across); causality via the kernel's
        # block-skipping mask.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        blocks = cfg.flash_blocks
        if blocks is None and hd % 128 != 0:
            # head_dim-64 fallback (odd head count / GQA): widest k block;
            # q block 384 when it divides seq, else the largest 128-multiple
            # divisor of seq up to 512.
            bq = 384 if s % 384 == 0 else max(
                b for b in (512, 256, 128) if s % b == 0
            )
            blocks = (bq, s)
        block_sizes = None
        if blocks is not None:
            bq, bk = min(blocks[0], s), min(blocks[1], s)
            block_sizes = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_k_dkv=bk, block_q_dkv=bq,
                block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
            )
        seg = mask.astype(jnp.int32)
        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            segment_ids=SegmentIds(seg, seg),
            causal=True,
            sm_scale=scale,
            block_sizes=block_sizes,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, s, nh * hd).astype(x.dtype)
        return _linear(out, params["o"], a8)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if cfg.attn_logit_softcapping:
        cap = cfg.attn_logit_softcapping
        logits = jnp.tanh(logits / cap) * cap
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, nh * hd)
    return _linear(out, params["o"], a8)


def mlp(cfg: DecoderConfig, params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    a8 = cfg.act_quant
    if "gateup" in params:
        # int4 fused gate+up (hf_loader.fuse_decode_tree): one packed
        # matvec dispatch over [D, 2*I]; the column split is free
        y = _linear(x, params["gateup"], a8)
        inter = y.shape[-1] // 2
        gate, up = y[..., :inter], y[..., inter:]
    else:
        gate = _linear(x, params["gate"], a8)
        up = _linear(x, params["up"], a8)
    act = jax.nn.gelu(gate, approximate=True) if cfg.gemma else jax.nn.silu(gate)
    return _linear(act * up, params["down"], a8)


def decoder_layer(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    x: jnp.ndarray,
    bias: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    r = cfg.residual_scale
    h = rms_norm(x, params["input_norm"], cfg.rms_norm_eps, cfg.gemma)
    h = attention(cfg, params["attn"], h, bias, cos, sin, mask=mask)
    if cfg.gemma:
        h = rms_norm(h, params["post_attn_norm"], cfg.rms_norm_eps, cfg.gemma)
        x = x + h
        h = rms_norm(x, params["pre_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        h = mlp(cfg, params["mlp"], h)
        h = rms_norm(h, params["post_mlp_norm"], cfg.rms_norm_eps, cfg.gemma)
        return x + h
    x = x + h * r
    h = rms_norm(x, params["post_norm"], cfg.rms_norm_eps)
    h = mlp(cfg, params["mlp"], h)
    return x + h * r


def embed(cfg: DecoderConfig, params: Dict[str, Any], input_ids: jnp.ndarray) -> jnp.ndarray:
    table = params["embed"]
    if isinstance(table, dict):
        # int8 embed table (per-row scales, hf_loader.quantize_linear_int8
        # over [V, D]): gather rows + their scales, dequant on the tiny
        # [B, S, D] gather result — halves the ~1 GB bf16 table the int4
        # co-residency budget counts (only the int4 LLM stores this form)
        rows = jnp.take(table["w_q"], input_ids, axis=0).astype(cfg.dtype)
        scales = jnp.take(table["scale"], input_ids, axis=0).astype(cfg.dtype)
        h = rows * scales[..., None]
    else:
        h = jnp.take(table, input_ids, axis=0)
    if cfg.gemma:
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, dtype=h.dtype)
    elif cfg.scale_emb != 1.0:
        h = h * cfg.scale_emb
    return h


def forward_hidden(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,  # [B, S]
    attention_mask: jnp.ndarray,  # [B, S]
    position_ids: Optional[jnp.ndarray] = None,
    num_layers: Optional[int] = None,
    collect_norms_at: Optional[List[int]] = None,
) -> Any:
    """Run the decoder stack.

    Returns the final-normed hidden state ``[B, S, D]``; with
    ``collect_norms_at`` given, returns the list of ``norm(hidden)`` taken
    *before* running each listed layer index — matching the reference's
    layerwise collection points (``modeling_minicpm_reranker.py:1081-1084``,
    where ``cutoff_layers=[L]`` yields the normed output of the first L
    layers).
    """
    if position_ids is None:
        # [1, S]: batch-shared positions let the flash64 path rope in-kernel
        s = input_ids.shape[1]
        position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
    cos, sin = rope_tables(position_ids, cfg.hd, cfg.rope_theta)
    bias = attention_bias_from_mask(attention_mask)
    h = embed(cfg, params, input_ids)
    n = num_layers if num_layers is not None else cfg.num_hidden_layers
    collected = []
    for idx in range(n):
        if collect_norms_at and idx in collect_norms_at:
            collected.append(rms_norm(h, params["final_norm"], cfg.rms_norm_eps, cfg.gemma))
        h = decoder_layer(cfg, params["layers"][idx], h, bias, cos, sin, mask=attention_mask)
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps, cfg.gemma)
    if collect_norms_at is not None:
        if n in collect_norms_at:
            collected.append(h)
        return collected
    return h


# ---------------------------------------------------------------------------
# Parameter initialization (tiny models for tests; real weights come from
# hf_loader)
# ---------------------------------------------------------------------------

def init_params(cfg: DecoderConfig, key: jax.Array) -> Dict[str, Any]:
    def dense(key, n_in, n_out, bias):
        p = {"w": jax.random.normal(key, (n_out, n_in), cfg.dtype) * 0.02}
        if bias:
            p["b"] = jnp.zeros((n_out,), cfg.dtype)
        return p

    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    d, hd = cfg.hidden_size, cfg.hd
    layers = []
    for i in range(cfg.num_hidden_layers):
        k = jax.random.split(keys[i], 8)
        layer = {
            "input_norm": jnp.ones((d,), cfg.dtype),
            "attn": {
                "q": dense(k[0], d, cfg.num_attention_heads * hd, cfg.attention_bias),
                "k": dense(k[1], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                "v": dense(k[2], d, cfg.num_key_value_heads * hd, cfg.attention_bias),
                "o": dense(k[3], cfg.num_attention_heads * hd, d, False),
            },
            "mlp": {
                "gate": dense(k[4], d, cfg.intermediate_size, False),
                "up": dense(k[5], d, cfg.intermediate_size, False),
                "down": dense(k[6], cfg.intermediate_size, d, False),
            },
        }
        if cfg.gemma:
            layer["post_attn_norm"] = jnp.ones((d,), cfg.dtype)
            layer["pre_mlp_norm"] = jnp.ones((d,), cfg.dtype)
            layer["post_mlp_norm"] = jnp.ones((d,), cfg.dtype)
        else:
            layer["post_norm"] = jnp.ones((d,), cfg.dtype)
        layers.append(layer)
    return {
        "embed": jax.random.normal(keys[-2], (cfg.vocab_size, d), cfg.dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
    }
