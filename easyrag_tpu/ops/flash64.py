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


def _rope_rows(x_ref, cos_ref, sin_ref, rot_ref, out_ref, pairs):
    """Apply rotate-half RoPE to a whole [S, 128*pairs] row inside VMEM.

    The rotate-half permutation is a constant 64x64 matrix (rot_ref), so the
    'rotate' runs on the MXU and every VPU op is full-128-lane wide — the
    host-side formulation costs 3-4 ms of HBM round trips per pass at the
    operating shape; in-kernel it is ~free. f32 math, bf16 result: exactly
    the reference's apply_rotary_pos_emb
    (``modeling_minicpm_reranker.py:246-252``).
    """
    cs = cos_ref[:]  # [S, 128] f32, one head-pair wide (tiled per 64 lanes)
    sn = sin_ref[:]
    rot = rot_ref[:]  # [64, 64] rotate-half permutation (+-1 entries)
    for p in range(pairs):
        sl = slice(128 * p, 128 * p + 128)
        x = x_ref[0, :, sl]  # [S, 128] bf16
        r0 = jnp.dot(x[:, :64], rot, preferred_element_type=jnp.float32)
        r1 = jnp.dot(x[:, 64:], rot, preferred_element_type=jnp.float32)
        r = jnp.concatenate([r0, r1], axis=1)  # [S, 128] f32
        out_ref[:, sl] = (
            x.astype(jnp.float32) * cs + r * sn
        ).astype(out_ref.dtype)


def _kernel(
    first_real_ref,  # scalar prefetch: [B] int32, first real position per row
    q_ref,  # [1, S, 128*pairs]
    k_ref,  # [1, S, 128*pairs]
    v_ref,  # [1, S, 128*pairs]
    cos_ref,  # [S, 128] f32 (or None via pairs of specs when rope disabled)
    sin_ref,
    rot_ref,  # [64, 64] rotate-half permutation
    o_ref,  # [1, S, 128*pairs]
    qs_ref,  # VMEM scratch [S, 128*pairs]: roped q
    ks_ref,  # VMEM scratch [S, 128*pairs]: roped k
    *,
    sm_scale: float,
    sizes: tuple,  # static q/k block plan; sum(sizes) == S. The last block
    # may be ragged (any multiple of 8) so the model can run at the
    # reference's exact pad-to-x8 sequence length instead of a 128 bucket.
    pairs: int,
    rope: bool,
):
    b = pl.program_id(0)
    start = first_real_ref[b]
    offs = [0]
    for sz in sizes:
        offs.append(offs[-1] + sz)

    if rope:
        _rope_rows(q_ref, cos_ref, sin_ref, rot_ref, qs_ref, pairs)
        _rope_rows(k_ref, cos_ref, sin_ref, rot_ref, ks_ref, pairs)
        q_src, k_src = qs_ref, ks_ref
    else:
        q_src, k_src = None, None

    dims = (((1,), (1,)), ((), ()))  # contract lane dims, no batch dims

    def q_at(rows, lanes):
        if rope:
            return q_src[rows, lanes]
        return q_ref[0, rows, lanes]

    def k_at(rows, lanes):
        if rope:
            return k_src[rows, lanes]
        return k_ref[0, rows, lanes]

    for h in range(2 * pairs):
        lanes = slice(64 * h, 64 * h + 64)
        for iq, bq_i in enumerate(sizes):
            kv_len = offs[iq + 1]  # causally live prefix, static
            qh = q_at(pl.ds(offs[iq], bq_i), lanes)
            blocks = []
            for jk in range(iq + 1):
                base, bk_j = offs[jk], sizes[jk]
                kh = k_at(pl.ds(base, bk_j), lanes)
                l = jax.lax.dot_general(
                    qh, kh, dims, preferred_element_type=jnp.float32
                )
                col = jax.lax.broadcasted_iota(jnp.int32, (bq_i, bk_j), 1)
                keep = (base + col) >= start  # left-pad prefix mask
                if jk == iq:  # diagonal block: causal triangle
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (bq_i, bk_j), 0
                    )
                    keep = keep & (row >= col)
                blocks.append(jnp.where(keep, l * sm_scale, MASK_VALUE))
            s = (
                blocks[0]
                if len(blocks) == 1
                else jnp.concatenate(blocks, axis=1)
            )  # [bq_i, kv_len] f32
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            d = jnp.sum(e, axis=1, keepdims=True)
            p = (e / d).astype(q_ref.dtype)  # matches einsum's probs cast
            vh = v_ref[0, pl.ds(0, kv_len), lanes]  # [kv_len, 64]
            o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
            o_ref[0, pl.ds(offs[iq], bq_i), lanes] = o.astype(o_ref.dtype)


def _block_plan(S: int, HP: int, block_q: int) -> tuple:
    """(head pairs per program, q block) within the VMEM budget.

    Head-pair grouping amortizes per-program setup (576 -> 192 programs at
    the operating shape, measured 6.69 -> 6.26 ms/op) while keeping VMEM
    within the 16 MB budget. Accounting: q/k/v/o row buffers are
    DOUBLE-buffered by the pipeline (8 x S x 128g x 2B), plus 2 rope
    scratch rows, cos/sin f32, and ~2 live [bq, S] f32 softmax tiles.
    Long sequences / oversized caller block_q can exhaust the budget for
    every grouping — shrink the q block until some (pairs, block_q) fits
    rather than raising (r3: S=1536 at block_q 512 had no fit at 512).
    """

    def vmem_bytes(g, bq):
        rows = 8 * S * 128 * g * 2
        scratch = 2 * S * 128 * g * 2
        tables = 2 * S * 128 * 4 * 2
        softmax = 3 * bq * S * 4  # s/e/probs live tiles (measured edge)
        return rows + scratch + tables + softmax

    while True:
        pairs = next(
            (g for g in (3, 2, 1)
             if HP % g == 0 and vmem_bytes(g, block_q) <= 14 * 2**20),
            None,
        )
        if pairs is not None or block_q <= 8:
            break
        # halve within multiples of 8: block sizes and the ragged-remainder
        # offsets must stay sublane-aligned (kernel contract below)
        block_q = max(8, (block_q // 2) // 8 * 8)
    if pairs is None:
        pairs = 1  # minimal config; Mosaic gets the final say on VMEM
    return pairs, block_q


def flash64_attention(
    q: jnp.ndarray,  # [B, S, H*64], H even
    k: jnp.ndarray,  # [B, S, H*64]
    v: jnp.ndarray,  # [B, S, H*64]
    mask: jnp.ndarray,  # [B, S] int, 1 = real token; left-padded rows
    sm_scale: float,
    block_q: int | None = None,
    cos: jnp.ndarray | None = None,  # [S, 64] f32 rotate-half table
    sin: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Causal+padding attention, head pairs packed in the feature dimension.

    ``mask`` must be a left-pad mask (zeros form a prefix): the kernel masks
    positions before each row's first real token. Callers with non-prefix
    masks must use another path (see ``layers.attention`` — in this codebase
    only the left-padded MiniCPM reranker has head_dim 64).

    When ``cos``/``sin`` are given, rotate-half RoPE is applied to q and k
    INSIDE the kernel (positions must be shared across the batch, which
    holds for the reranker's arange positions): the host-side rope costs
    3-4 ms of HBM elementwise passes per q/k per layer at the operating
    shape; in-kernel it rides VMEM for ~free.
    """
    B, S, F = q.shape
    assert F % 128 == 0, "flash64 packs head pairs into 128 lanes"
    assert S % 8 == 0, "flash64 needs sublane-aligned sequence lengths"
    HP = F // 128
    if block_q is None:
        block_q = 384 if S >= 384 else S  # measured optimum at the op shape
    pairs, block_q = _block_plan(S, HP, block_q)
    # static block plan; the last block may be ragged so the model can run
    # at the reference's exact pad-to-x8 length (S=1064) instead of a 128
    # bucket — 8% of the whole model's dense FLOPs at the operating shape.
    n_full, rem = divmod(S, block_q)
    sizes = tuple([block_q] * n_full + ([rem] if rem else []))
    lanes = 128 * pairs
    first_real = (S - mask.sum(axis=1)).astype(jnp.int32)  # [B]

    rope = cos is not None
    if rope:
        # one head-pair-wide f32 tables + the rotate-half permutation matrix
        cs = jnp.concatenate([cos, cos], axis=1).astype(jnp.float32)  # [S,128]
        sn = jnp.concatenate([sin, sin], axis=1).astype(jnp.float32)
        eye = jnp.eye(32, dtype=q.dtype)
        zero = jnp.zeros((32, 32), q.dtype)
        # rotate_half: out[:32] = -x[32:], out[32:] = x[:32]
        rot = jnp.block([[zero, eye], [-eye, zero]])
    else:
        cs = jnp.zeros((8, 128), jnp.float32)
        sn = jnp.zeros((8, 128), jnp.float32)
        rot = jnp.zeros((64, 64), q.dtype)

    def row_spec():
        return pl.BlockSpec(
            (1, S, lanes),
            lambda b, hp, fr: (b, 0, hp),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, HP // pairs),
        in_specs=[
            row_spec(),
            row_spec(),
            row_spec(),
            pl.BlockSpec(
                cs.shape, lambda b, hp, fr: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                sn.shape, lambda b, hp, fr: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (64, 64), lambda b, hp, fr: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=row_spec(),
        scratch_shapes=[
            pltpu.VMEM((S, lanes), q.dtype),
            pltpu.VMEM((S, lanes), q.dtype),
        ],
    )
    kernel = functools.partial(
        _kernel,
        sm_scale=sm_scale,
        sizes=sizes,
        pairs=pairs,
        rope=rope,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, F), q.dtype),
    )(first_real, q, k, v, cs, sn, rot)
