"""w8a8 dynamic activation quantization (layers._linear, cfg.act_quant).

The int8 weight-only path reads half the bytes but still contracts at the
bf16 MXU rate; w8a8 quantizes activations per-token at run time so the
s8 x s8 contraction runs at the MXU's double int8 rate (v5e: 394 vs 197
TOPS). Opt-in (``tpu.embedder_quant: w8a8`` / ``tpu.reranker_quant:
w8a8``). These tests pin the numerics contract: bounded per-op error vs
the exact product, model-level closeness and rank stability vs the
weight-only path, and zero-row safety.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from easyrag_tpu.models.hf_loader import quantize_linear_int8  # noqa: E402
from easyrag_tpu.models.layers import (  # noqa: E402
    DecoderConfig,
    _linear,
    forward_hidden,
    init_params,
)


def test_w8a8_linear_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = rng.normal(size=(32, 64)).astype(np.float32)
    p = quantize_linear_int8(w)
    exact = np.asarray(x) @ w.T
    got = np.asarray(_linear(x, p, a8=True))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    # two int8 quantizations of gaussian operands: a few percent RMS
    assert rel < 0.05, rel
    # and strictly noisier than the weight-only path (sanity: the flag
    # actually changes the computation)
    w_only = np.asarray(_linear(x, p, a8=False))
    assert not np.allclose(got, w_only)


def test_w8a8_zero_token_row_is_safe():
    w = np.eye(8, dtype=np.float32)
    p = quantize_linear_int8(w)
    x = jnp.zeros((3, 8), jnp.float32)
    y = np.asarray(_linear(x, p, a8=True))
    assert np.all(np.isfinite(y)) and np.all(y == 0.0)


from easyrag_tpu.models.hf_loader import quantize_decoder_tree as _quantize_tree  # noqa: E402


def test_w8a8_forward_close_and_rank_stable():
    cfg = DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(0))
    qparams = _quantize_tree(params)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, size=(8, 16)), jnp.int32)
    mask = jnp.ones((8, 16), jnp.int32)

    h_w8 = np.asarray(forward_hidden(cfg, qparams, ids, mask))
    cfg_a8 = dataclasses.replace(cfg, act_quant=True)
    h_a8 = np.asarray(forward_hidden(cfg_a8, qparams, ids, mask))

    # per-position cosine similarity stays high through 4 layers of
    # accumulated activation-quant noise
    num = np.sum(h_w8 * h_a8, axis=-1)
    den = np.linalg.norm(h_w8, axis=-1) * np.linalg.norm(h_a8, axis=-1)
    assert np.min(num / den) > 0.99, np.min(num / den)

    # last-token "score" ordering (the reranker read-out shape) is
    # preserved: project to a scalar per row and compare rankings
    head = rng.normal(size=(64,)).astype(np.float32)
    s_w8 = h_w8[:, -1, :] @ head
    s_a8 = h_a8[:, -1, :] @ head
    assert list(np.argsort(s_w8)) == list(np.argsort(s_a8))


def test_loader_accepts_w8a8_and_sets_act_quant(tmp_path):
    from easyrag_tpu.models.hf_loader import load_decoder_params

    with pytest.raises(ValueError):
        load_decoder_params(str(tmp_path), 1, quant="fp8")  # int4 became
        # a supported mode in r4 (tests/test_int4.py)


def test_w8a8_tp_matches_unsharded():
    """w8a8 under tensor parallelism: the per-token amax in row-parallel
    projections (o/down) spans the sharded feature axis, so GSPMD must
    lower it as a cross-shard reduce — activations quantize with the
    GLOBAL scale, never a shard-local one. Parity vs single-device pins
    that contract."""
    from easyrag_tpu.parallel.mesh import data_model_mesh
    from easyrag_tpu.parallel.tp import shard_decoder_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype=jnp.float32, act_quant=True,
    )
    params = _quantize_tree(init_params(cfg, jax.random.key(0)))
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 64, size=(3, 12)), jnp.int32)
    mask = jnp.ones((3, 12), jnp.int32)
    ref = np.asarray(forward_hidden(cfg, params, ids, mask))

    mesh = data_model_mesh(8, model_parallel=2)
    sharded = shard_decoder_params(mesh, cfg, params, axis="model")
    with mesh:
        got = np.asarray(forward_hidden(cfg, sharded, ids, mask))
    # int8 contractions are integer-exact and s32 partial sums are
    # associative, so TP may only reorder the f32 rescale/residual math
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_device_quantizer_matches_host():
    """quantize_linear_int8_device (jittable, used by on-device benches)
    must produce bit-identical w_q/scale to the production numpy loader
    path — including the zero-row scale-1.0 convention."""
    from easyrag_tpu.models.hf_loader import quantize_linear_int8_device

    rng = np.random.default_rng(3)
    w = rng.normal(size=(16, 24)).astype(np.float32)
    w[5] = 0.0  # zero output row
    host = quantize_linear_int8(w)
    dev = jax.jit(quantize_linear_int8_device)(jnp.asarray(w))
    # XLA lowers /127 as a reciprocal multiply: scales match to 1 ulp and
    # the resulting int codes may differ by at most one step (none here)
    dq, hq = np.asarray(dev["w_q"], np.int32), np.asarray(host["w_q"], np.int32)
    assert np.abs(dq - hq).max() <= 1
    assert (dq != hq).mean() < 0.01
    np.testing.assert_allclose(np.asarray(dev["scale"]), np.asarray(host["scale"]),
                               rtol=1e-6)
    assert np.asarray(dev["scale"])[5] == 1.0  # zero-row convention shared
