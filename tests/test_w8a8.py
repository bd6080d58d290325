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


def _quantize_tree(params):
    """Replace every {"w": ...} linear in the layers tree with int8."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        q = {}
        for k, v in layer.items():
            if k in ("attn", "mlp"):
                q[k] = {
                    name: (
                        {**quantize_linear_int8(np.asarray(p["w"], np.float32)),
                         **({"b": p["b"]} if "b" in p else {})}
                    )
                    for name, p in v.items()
                }
            else:
                q[k] = v
        out["layers"].append(q)
    return out


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
        load_decoder_params(str(tmp_path), 1, quant="int4")
