"""flash64 kernel (head_dim-64 fused attention) vs the einsum path.

Runs in pallas interpret mode on the CPU mesh; the kernel's real-TPU
numbers live in BASELINE.md (tools/bench_attn64.py, tools/bench_reranker.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from easyrag_tpu.models.layers import DecoderConfig, forward_hidden, init_params


def _cfg(use_flash, heads=4, layers=2):
    return DecoderConfig(
        vocab_size=64,
        hidden_size=heads * 64,
        intermediate_size=128,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=64,
        use_flash=use_flash,
        # MiniCPM-style scalings to exercise the real reranker config shape
        scale_emb=12.0,
        scale_depth=1.4,
        dim_model_base=256.0,
        dtype=jnp.float32,
    )


def test_flash64_matches_einsum_interpret():
    from jax.experimental.pallas import tpu as pltpu

    params = init_params(_cfg(False), jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, size=(3, 256)).astype(np.int32))
    mask = np.ones((3, 256), dtype=np.int32)
    mask[0, :37] = 0  # left padding, not block-aligned
    mask[1, :128] = 0  # exactly one block of padding
    mask = jnp.asarray(mask)

    ref = np.asarray(forward_hidden(_cfg(False), params, ids, mask))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forward_hidden(_cfg(True), params, ids, mask))
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(got[m], ref[m], rtol=2e-4, atol=2e-4)


def test_flash64_kernel_direct_left_pad_and_causal():
    from jax.experimental.pallas import tpu as pltpu

    from easyrag_tpu.ops.flash64 import flash64_attention

    B, H, S, HD = 2, 2, 256, 64
    q = jax.random.normal(jax.random.key(1), (B, S, H * HD), jnp.float32)
    k = jax.random.normal(jax.random.key(2), (B, S, H * HD), jnp.float32)
    v = jax.random.normal(jax.random.key(3), (B, S, H * HD), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[1, :100] = 0
    mask = jnp.asarray(mask)
    scale = HD ** -0.5

    qh = q.reshape(B, S, H, HD)
    kh = k.reshape(B, S, H, HD)
    vh = v.reshape(B, S, H, HD)
    causal = jnp.tril(jnp.ones((S, S), bool))
    keep = causal[None, None] & (mask[:, None, None, :] > 0)
    lg = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                    preferred_element_type=jnp.float32) * scale
    lg = jnp.where(keep, lg, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(lg, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, S, H * HD)

    with pltpu.force_tpu_interpret_mode():
        got = flash64_attention(q, k, v, mask, scale, block_q=128)

    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(ref)[m], rtol=2e-4, atol=2e-4
    )


def test_block_plan_shrinks_instead_of_raising():
    """S=1536 at caller block_q 512 has no VMEM fit at any head-pair
    grouping; the plan must shrink the q block, not raise (r3 regression:
    StopIteration from the grouping search)."""
    from easyrag_tpu.ops.flash64 import _block_plan

    pairs, bq = _block_plan(1536, 18, 512)
    assert pairs in (1, 2, 3) and bq < 512 and bq % 8 == 0
    # deep-shrink case: S=3072 halves past 48 where naive halving would
    # produce 24 -> 12 (not x8); the plan must keep every block sublane-
    # aligned, since S % 8 == 0 only yields x8 ragged remainders if
    # block_q itself is x8
    for s in (3040, 3072):
        p2, bq2 = _block_plan(s, 18, 384)
        assert p2 >= 1 and bq2 % 8 == 0, (s, p2, bq2)
    # the returned plan fits the budget it enforces
    rows = 8 * 1536 * 128 * pairs * 2
    scratch = 2 * 1536 * 128 * pairs * 2
    tables = 2 * 1536 * 128 * 4 * 2
    softmax = 3 * bq * 1536 * 4
    assert rows + scratch + tables + softmax <= 14 * 2**20
    # the operating shape keeps its measured config untouched (pairs=2
    # fits the 14 MB budget at S=1064/bq=384; 3 would need 15.2 MB)
    assert _block_plan(1064, 18, 384) == (2, 384)
