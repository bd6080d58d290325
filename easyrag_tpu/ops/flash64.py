"""Fused attention kernel for head_dim-64 decoders (the MiniCPM reranker).

Why this exists: the pipeline's dominant stage is the LLM reranker forward
(SURVEY §3 hot loop #1, ``/root/reference/src/easyrag/custom/rerankers.py:307-345``)
whose model family (bge-reranker-v2-minicpm-layerwise) has 36 heads of
dim 64. At head_dim 64:

* the einsum path materializes the [B,H,S,S] logits in HBM (~6 GB at the
  operating shape) — measured 21 ms/op on v5e (tools/bench_attn64.py);
* the stock jax flash kernel runs 9.9 ms/op at its best block size — it
  re-streams K/V per q block, runs one program per (batch, head, q block)
  (per-program setup dominates at small head_dim), and pays layout
  transposes around its [B,H,S,D] calling convention.

Measured design facts (tools/bench_mxu_k64.py, /tmp decomposition runs):
the MXU runs contraction-64 matmuls at ~50% peak (so QK^T/AV are stuck at
2x the causal ideal; head packing cannot help — the +/- trick doubles FLOPs
exactly as much as it doubles the rate); the f32 softmax itself costs only
~0.6 ms at the operating shape (exp is ~1 elem/lane/cycle); the remaining
cost is per-program overhead. Hence:

* grid = (batch, head_pair) ONLY — 576 programs at the operating shape, not
  1728+ — with the q-block loop INSIDE the kernel as a static python
  unroll: blocks above the causal diagonal are skipped at trace time, only
  diagonal blocks carry the triangle mask, and Mosaic can software-pipeline
  the whole static schedule;
* K/V/Q/O are whole [S, 128] rows per program, DMA'd once — no re-streaming
  and no host-side slice/concat;
* two heads ride per program in the lane dimension — the natural
  ``[B, S, H*64]`` hidden layout puts head pairs at 128-lane boundaries, so
  there is no transpose or re-pack anywhere, and the heads' independent
  compute chains interleave MXU and VPU work;
* softmax is one bulk max/exp/sum per q block over its causally live
  prefix; the 1/denominator multiply lands on the [bq,64] output instead of
  the [bq,S] probability matrix;
* left padding is masked, not skipped (the pad prefix is <10% of the
  operating shape; a dynamically-bounded loop measured slower than the
  masked static unroll).

Numerics match the einsum path: f32 logits & softmax, probabilities cast to
bf16 after normalization (same rounding as the einsum path's
``softmax().astype(bf16)``), mask value finfo.min. Fully-masked (pad) q
rows produce uniform exp(MASK-MASK)=1 weights — the same uniform-average
garbage as the einsum path, never NaN; such rows are pad positions whose
outputs are masked from real positions at every layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = float(jnp.finfo(jnp.float32).min)


def _kernel(
    first_real_ref,  # scalar prefetch: [B] int32, first real position per row
    q_ref,  # [1, S, 128]
    k_ref,  # [1, S, 128]
    v_ref,  # [1, S, 128]
    o_ref,  # [1, S, 128]
    *,
    sm_scale: float,
    block_q: int,
    seq: int,
    pairs: int,
):
    b = pl.program_id(0)
    start = first_real_ref[b]
    nq = seq // block_q

    dims = (((1,), (1,)), ((), ()))  # contract lane dims, no batch dims
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 1)

    for h in range(2 * pairs):
        lanes = slice(64 * h, 64 * h + 64)
        for iq in range(nq):
            kv_len = (iq + 1) * block_q  # causally live prefix, static
            qh = q_ref[0, pl.ds(iq * block_q, block_q), lanes]
            blocks = []
            for jk in range(iq + 1):
                base = jk * block_q
                kh = k_ref[0, pl.ds(base, block_q), lanes]
                l = jax.lax.dot_general(
                    qh, kh, dims, preferred_element_type=jnp.float32
                )
                keep = (base + col) >= start  # left-pad prefix mask
                if jk == iq:  # diagonal block: causal triangle
                    keep = keep & (row >= col)
                blocks.append(jnp.where(keep, l * sm_scale, MASK_VALUE))
            s = (
                blocks[0]
                if len(blocks) == 1
                else jnp.concatenate(blocks, axis=1)
            )  # [bq, kv_len] f32
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            d = jnp.sum(e, axis=1, keepdims=True)
            p = (e / d).astype(q_ref.dtype)  # matches einsum's probs cast
            vh = v_ref[0, pl.ds(0, kv_len), lanes]  # [kv_len, 64]
            o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
            o_ref[0, pl.ds(iq * block_q, block_q), lanes] = o.astype(
                o_ref.dtype
            )


def flash64_attention(
    q: jnp.ndarray,  # [B, S, H*64], H even
    k: jnp.ndarray,  # [B, S, H*64]
    v: jnp.ndarray,  # [B, S, H*64]
    mask: jnp.ndarray,  # [B, S] int, 1 = real token; left-padded rows
    sm_scale: float,
    block_q: int | None = None,
) -> jnp.ndarray:
    """Causal+padding attention, head pairs packed in the feature dimension.

    ``mask`` must be a left-pad mask (zeros form a prefix): the kernel masks
    positions before each row's first real token. Callers with non-prefix
    masks must use another path (see ``layers.attention`` — in this codebase
    only the left-padded MiniCPM reranker has head_dim 64).
    """
    B, S, F = q.shape
    assert F % 128 == 0, "flash64 packs head pairs into 128 lanes"
    HP = F // 128
    if block_q is None:
        block_q = next(b for b in (384, 256, 128) if S % b == 0)
    # head pairs per program: amortizes per-program setup (576 -> 192
    # programs at the operating shape, measured 6.69 -> 6.26 ms/op) while
    # keeping VMEM under ~8 MB (4 row buffers x S x 128*G x 2B).
    pairs = next(g for g in (3, 2, 1) if HP % g == 0 and S * 128 * g * 4 * 2 <= 8 * 2**20)
    lanes = 128 * pairs
    first_real = (S - mask.sum(axis=1)).astype(jnp.int32)  # [B]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, HP // pairs),
        in_specs=[
            pl.BlockSpec(
                (1, S, lanes),
                lambda b, hp, fr: (b, 0, hp),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, S, lanes),
                lambda b, hp, fr: (b, 0, hp),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, S, lanes),
                lambda b, hp, fr: (b, 0, hp),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, S, lanes),
            lambda b, hp, fr: (b, 0, hp),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, block_q=block_q, seq=S, pairs=pairs
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, F), q.dtype),
    )(first_real, q, k, v)
