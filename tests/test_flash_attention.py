"""Flash-attention path vs the einsum reference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easyrag_tpu.models.layers import DecoderConfig, forward_hidden, init_params


def _cfg(use_flash):
    return DecoderConfig(
        vocab_size=64,
        hidden_size=128,
        intermediate_size=128,
        num_hidden_layers=1,
        num_attention_heads=1,
        num_key_value_heads=1,
        head_dim=128,
        attention_bias=True,
        use_flash=use_flash,
        dtype=jnp.float32,
    )


def test_flash_matches_einsum_interpret():
    from jax.experimental.pallas import tpu as pltpu

    params = init_params(_cfg(False), jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 256)).astype(np.int32))
    mask = np.ones((2, 256), dtype=np.int32)
    mask[1, :64] = 0  # left padding on row 1
    mask = jnp.asarray(mask)

    ref = np.asarray(forward_hidden(_cfg(False), params, ids, mask))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(forward_hidden(_cfg(True), params, ids, mask))
    # compare real positions (padded rows are garbage in both paths)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, 64:], ref[1, 64:], rtol=2e-4, atol=2e-4)


def test_flash_gate_falls_back_on_bad_shapes():
    # seq not a multiple of 128 -> einsum path even with use_flash on; the
    # result must simply be correct (same as flash-off)
    cfg_on, cfg_off = _cfg(True), _cfg(False)
    params = init_params(cfg_off, jax.random.key(1))
    ids = jnp.asarray(np.arange(2 * 100).reshape(2, 100) % 64)
    mask = jnp.ones((2, 100), jnp.int32)
    a = np.asarray(forward_hidden(cfg_on, params, ids, mask))
    b = np.asarray(forward_hidden(cfg_off, params, ids, mask))
    np.testing.assert_allclose(a, b, rtol=1e-6)
