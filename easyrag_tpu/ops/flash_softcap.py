"""Fused causal attention with logit softcapping (the Gemma2 reranker).

Why this exists: bge-reranker-v2.5-gemma2-lightweight
(``/root/reference/src/easyrag/utils/gemma_model.py:377-380``) softcaps its
attention logits (``tanh(l/c)*c``), which excludes BOTH existing flash
paths (``models/layers.py`` gates them on ``not attn_logit_softcapping``),
so the 9B premium reranker has been paying the einsum path's materialized
``[B, H, S, S]`` f32 logits — ~2 GiB per 32-pair batch at S=1024, twice
(QK^T out + softmax in), per layer. This kernel applies the softcap INSIDE
the VMEM tile between the QK^T matmul and the softmax, so the scores never
touch HBM.

Design (follows ``ops/flash64.py``'s measured recipe, adapted to the
Gemma2 shape — 16 heads of dim 256, GQA 8 KV heads):

* grid = (batch, kv_head); each program owns one KV head and its
  ``g = nh/nkv`` query heads. The ``[B, S, H*D]`` hidden layout puts a KV
  head's query group at one contiguous ``g*D``-lane slice — no transposes
  or repeats anywhere (the einsum path materializes the KV repeat).
* the q-block loop is a static python unroll; blocks above the causal
  diagonal are skipped at trace time, only diagonal blocks carry the
  triangle mask; the last block may be ragged (any multiple of 8).
* softmax is one bulk max/exp/sum per q block over its causally live
  prefix (at reranker sequence lengths the [bq, S] f32 tile fits VMEM;
  no online rescaling needed).
* contraction is the full head_dim (256) — the MXU regime where flash64's
  head-pair packing tricks are unnecessary.

**Right-padding contract**: callers must pad on the RIGHT (zeros form a
mask suffix) — the Gemma reranker's convention, enforced by its token
compression (``models/gemma.py::build_inputs``). Under right padding,
causality alone excludes pad keys for every real query row (pad columns
sit at positions > any real row), so the kernel needs no mask input at
all. Pad query rows compute a harmless causal softmax over garbage — same
as the einsum path they are never read (scores pool at the last REAL
position; compression weights invalid slots 0).

Numerics match the einsum path on real rows: f32 logits, softcap, f32
softmax, probabilities cast to the input dtype after normalization.
Interpret mode is bit-faithful (tests/test_flash_softcap.py); on real TPU
hardware the bf16 production path measured within 2 bf16 ULPs of the
einsum path (max abs 0.031 at output scale ~9, mean rel 1e-6) — the two
paths' f32 MXU passes use different precision lowerings (XLA vs Mosaic),
same situation as flash64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = float(jnp.finfo(jnp.float32).min)


def _kernel(
    q_ref,  # [1, S, g*D]
    k_ref,  # [1, S, D]
    v_ref,  # [1, S, D]
    o_ref,  # [1, S, g*D]
    *,
    sm_scale: float,
    softcap: float,
    sizes: tuple,  # static q block plan; sum(sizes) == S
    g: int,  # query heads per KV head
    d: int,  # head_dim
):
    offs = [0]
    for sz in sizes:
        offs.append(offs[-1] + sz)
    dims = (((1,), (1,)), ((), ()))  # contract head_dim, no batch dims

    for h in range(g):
        lanes = slice(d * h, d * h + d)
        for iq, bq_i in enumerate(sizes):
            kv_len = offs[iq + 1]  # causally live prefix, static
            qh = q_ref[0, pl.ds(offs[iq], bq_i), lanes]
            blocks = []
            for jk in range(iq + 1):
                base, bk_j = offs[jk], sizes[jk]
                kh = k_ref[0, pl.ds(base, bk_j), :]
                l = jax.lax.dot_general(
                    qh, kh, dims, preferred_element_type=jnp.float32
                ) * sm_scale
                if softcap:
                    l = jnp.tanh(l / softcap) * softcap
                if jk == iq:  # diagonal block: causal triangle
                    row = jax.lax.broadcasted_iota(jnp.int32, (bq_i, bk_j), 0)
                    col = jax.lax.broadcasted_iota(jnp.int32, (bq_i, bk_j), 1)
                    l = jnp.where(row >= col, l, MASK_VALUE)
                blocks.append(l)
            s = (
                blocks[0]
                if len(blocks) == 1
                else jnp.concatenate(blocks, axis=1)
            )  # [bq_i, kv_len] f32
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            dnm = jnp.sum(e, axis=1, keepdims=True)
            p = (e / dnm).astype(q_ref.dtype)  # matches einsum's probs cast
            vh = v_ref[0, pl.ds(0, kv_len), :]  # [kv_len, D]
            o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
            o_ref[0, pl.ds(offs[iq], bq_i), lanes] = o.astype(o_ref.dtype)


def _rows_bytes(S: int, d: int, g: int) -> int:
    # q/k/v/o whole rows, double-buffered by the pipeline, bf16
    return 2 * (2 * S * g * d + 2 * S * d) * 2


def supported(S: int, d: int, g: int) -> bool:
    """Whole-row DMA caps the sequence length this kernel can take (the
    reranker runs S <= ~1.5k; prefill-scale sequences must use another
    path)."""
    return _rows_bytes(S, d, g) + 3 * 8 * S * 4 <= 14 * 2**20


def _block_plan(S: int, d: int, g: int, block_q: int) -> int:
    """Largest q block whose VMEM footprint fits the ~14 MB budget.

    Accounting mirrors flash64: q/k/v/o rows double-buffered by the
    pipeline, plus ~3 live [bq, S] f32 softmax tiles. Callers must check
    :func:`supported` first — past that, some block_q >= 8 always fits."""

    def vmem_bytes(bq):
        return _rows_bytes(S, d, g) + 3 * bq * S * 4

    while vmem_bytes(block_q) > 14 * 2**20 and block_q > 8:
        block_q = max(8, (block_q // 2) // 8 * 8)
    return block_q


def flash_softcap_attention(
    q: jnp.ndarray,  # [B, S, NH*D]
    k: jnp.ndarray,  # [B, S, NKV*D]
    v: jnp.ndarray,  # [B, S, NKV*D]
    num_heads: int,
    num_kv_heads: int,
    sm_scale: float,
    softcap: float = 0.0,
    block_q: int | None = None,
) -> jnp.ndarray:
    """Causal softcapped attention, GQA-native, RIGHT-padding safe.

    RoPE must already be applied (host-side; the Gemma segments use
    batch-shared arange positions, so an in-kernel variant is possible but
    attention here is matmul-bound at contraction 256 — unlike flash64's
    contraction-64 regime where rope's HBM passes mattered).
    """
    B, S, F = q.shape
    assert F % num_heads == 0
    d = F // num_heads
    assert d % 128 == 0, "flash_softcap needs head_dim % 128 == 0"
    assert num_heads % num_kv_heads == 0
    assert S % 8 == 0, "sublane-aligned sequence lengths"
    g = num_heads // num_kv_heads
    if block_q is None:
        block_q = 384 if S >= 384 else S
    block_q = _block_plan(S, d, g, min(block_q, S))
    n_full, rem = divmod(S, block_q)
    sizes = tuple([block_q] * n_full + ([rem] if rem else []))

    grid = (B, num_kv_heads)
    q_spec = pl.BlockSpec(
        (1, S, g * d), lambda b, kv: (b, 0, kv), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, S, d), lambda b, kv: (b, 0, kv), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, softcap=softcap, sizes=sizes, g=g, d=d
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, F), q.dtype),
    )(q, k, v)
