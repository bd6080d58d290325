"""flash_softcap kernel (Gemma2 fused attention) vs the einsum path.

Runs in pallas interpret mode on the CPU mesh; real-TPU numbers live in
BASELINE.md (tools/bench_gemma9b.py). The contract: identical outputs to
the einsum+softcap path at every REAL (non-pad) position under the Gemma
reranker's right-padding convention, across GQA ratios and ragged
(non-128) sequence lengths.
"""

import numpy as np

import jax
import jax.numpy as jnp

from easyrag_tpu.models.layers import DecoderConfig, forward_hidden, init_params


def _cfg(use_flash, heads=4, kv_heads=2, layers=2, softcap=30.0):
    return DecoderConfig(
        vocab_size=64,
        hidden_size=heads * 128,
        intermediate_size=128,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        head_dim=128,
        gemma=True,
        attn_logit_softcapping=softcap,
        query_pre_attn_scalar=144.0,
        use_flash=use_flash,
        dtype=jnp.float32,
    )


def _right_pad_mask(lengths, s):
    mask = np.zeros((len(lengths), s), dtype=np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
    return jnp.asarray(mask)


def test_flash_softcap_matches_einsum_interpret():
    from jax.experimental.pallas import tpu as pltpu

    params = init_params(_cfg(False), jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, size=(3, 256)).astype(np.int32))
    mask = _right_pad_mask([256, 219, 128], 256)  # incl. ragged real length

    ref = np.asarray(forward_hidden(_cfg(False), params, ids, mask))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forward_hidden(_cfg(True), params, ids, mask))
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(got[m], ref[m], rtol=2e-4, atol=2e-4)


def test_flash_softcap_gqa_ratios_and_ragged_seq():
    """GQA 1:1 / 2:1 / 4:1 at a ragged (x8 but not x128) sequence length."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    for kv in (4, 2, 1):
        params = init_params(_cfg(False, kv_heads=kv), jax.random.key(kv))
        ids = jnp.asarray(rng.integers(0, 64, size=(2, 136)).astype(np.int32))
        mask = _right_pad_mask([136, 93], 136)
        ref = np.asarray(forward_hidden(_cfg(False, kv_heads=kv), params, ids, mask))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                forward_hidden(_cfg(True, kv_heads=kv), params, ids, mask)
            )
        m = np.asarray(mask).astype(bool)
        np.testing.assert_allclose(got[m], ref[m], rtol=2e-4, atol=2e-4, err_msg=f"kv={kv}")


def test_flash_softcap_kernel_direct():
    """Kernel-level check against a numpy oracle (softcap -> causal mask ->
    softmax), GQA 2:1, head_dim 128."""
    from jax.experimental.pallas import tpu as pltpu

    from easyrag_tpu.ops.flash_softcap import flash_softcap_attention

    B, S, NH, NKV, D = 2, 64, 4, 2, 128
    cap, scale = 20.0, 0.11
    rng = np.random.default_rng(2)
    q = rng.standard_normal((B, S, NH, D)).astype(np.float32)
    k = rng.standard_normal((B, S, NKV, D)).astype(np.float32)
    v = rng.standard_normal((B, S, NKV, D)).astype(np.float32)

    # oracle
    krep = np.repeat(k, NH // NKV, axis=2)
    vrep = np.repeat(v, NH // NKV, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", q, krep) * scale
    logits = np.tanh(logits / cap) * cap
    causal = np.tril(np.ones((S, S), bool))
    logits = np.where(causal[None, None], logits, np.finfo(np.float32).min)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    p = e / e.sum(axis=-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", p, vrep).reshape(B, S, NH * D)

    with pltpu.force_tpu_interpret_mode():
        got = flash_softcap_attention(
            jnp.asarray(q.reshape(B, S, NH * D)),
            jnp.asarray(k.reshape(B, S, NKV * D)),
            jnp.asarray(v.reshape(B, S, NKV * D)),
            num_heads=NH,
            num_kv_heads=NKV,
            sm_scale=scale,
            softcap=cap,
            block_q=24,  # force multiple blocks + a ragged tail (24*2+16)
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_flash_softcap_block_plan_and_support():
    from easyrag_tpu.ops.flash_softcap import _block_plan, _rows_bytes, supported

    # the Gemma reranker's operating shapes are supported...
    assert supported(1152, 256, 2) and supported(1536, 256, 2)
    # ...and block_q shrinks to fit the softmax tiles in the VMEM budget
    bq = _block_plan(1536, 256, 2, 512)
    assert _rows_bytes(1536, 256, 2) + 3 * bq * 1536 * 4 <= 14 * 2**20
    assert bq % 8 == 0 and bq >= 8
    # prefill-scale sequences are refused (whole-row DMA can't fit): the
    # layers.attention gate falls back to the einsum path there
    assert not supported(8192, 256, 2)
