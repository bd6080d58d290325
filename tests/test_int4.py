"""int4 weight-only quantization: packing, dequant fusion form, decode.

int4 is the co-residency knob (half int8's HBM — VERDICT r3 #1: the 7B
generator next to the 7B embedder + reranker + indexes on one 16 GB chip).
These tests pin the mechanical contracts: nibble pack/unpack round-trips,
host/device quantizer parity, the ``_linear`` int4 branch equals the
explicit dequant form, the loader produces int4 leaves, and the KV-cache
decoder runs int4 end to end (matching the growing-forward oracle run with
the SAME int4 params — quantization changes the function, not the decode
algebra). Real-checkpoint quality is the standing environment-blocked gate.
"""

import numpy as np

import jax
import jax.numpy as jnp

from easyrag_tpu.models.hf_loader import (
    quantize_linear_int4,
    quantize_linear_int4_device,
    quantize_linear_int8,
    unpack_int4,
)
from easyrag_tpu.models.layers import _linear, init_params

from test_decode import VOCAB, oracle_greedy, run_cached, tiny_cfg


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 32)).astype(np.float32) * 0.05
    w[3] = 0.0  # zero row: scale must fall back to 1.0, not divide by 0
    p = quantize_linear_int4(w)
    assert p["w_p"].shape == (16, 16) and p["w_p"].dtype == jnp.int8
    w4 = np.asarray(unpack_int4(p["w_p"]))
    scale = np.asarray(p["scale"])
    # every unpacked value is the clipped rounded quotient, in [-7, 7]
    want = np.clip(np.rint(w / scale[:, None]), -7, 7)
    np.testing.assert_array_equal(w4, want)
    assert np.abs(w4).max() <= 7
    # dequant error bounded by scale/2 per element
    err = np.abs(w4 * scale[:, None] - w)
    assert (err <= scale[:, None] / 2 + 1e-7).all()


def test_device_quantizer_matches_host():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((24, 64)).astype(np.float32) * 0.03
    host = quantize_linear_int4(w)
    dev = jax.jit(quantize_linear_int4_device)(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(host["w_p"]), np.asarray(dev["w_p"]))
    np.testing.assert_allclose(
        np.asarray(host["scale"]), np.asarray(dev["scale"]), rtol=1e-6
    )


def test_linear_int4_equals_explicit_dequant():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((40, 32)).astype(np.float32) * 0.05
    b = rng.standard_normal((40,)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    p = {**quantize_linear_int4(w), "b": jnp.asarray(b)}
    got = np.asarray(_linear(x, p))
    w4 = unpack_int4(p["w_p"])
    want = np.asarray((x @ w4.T.astype(x.dtype)) * p["scale"].astype(x.dtype) + b)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_int4_error_vs_int8():
    """int4's per-element dequant error is coarser than int8's (the
    documented trade) but bounded by its own scale step."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.02
    p4, p8 = quantize_linear_int4(w), quantize_linear_int8(w)
    w4 = np.asarray(unpack_int4(p4["w_p"])) * np.asarray(p4["scale"])[:, None]
    w8 = np.asarray(p8["w_q"]) * np.asarray(p8["scale"])[:, None]
    e4, e8 = np.abs(w4 - w).mean(), np.abs(w8 - w).mean()
    assert e8 < e4 < 16 * e8 * 1.5  # ~16x coarser steps, same uniform noise


def test_loader_int4_leaves(tmp_path):
    """load_decoder_params(quant='int4') stores packed matmul weights."""
    import safetensors.numpy as st

    from easyrag_tpu.models.hf_loader import load_decoder_params

    rng = np.random.default_rng(4)
    d, inter, v = 32, 64, 48
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((v, d)).astype(np.float32),
        "model.norm.weight": np.ones((d,), np.float32),
    }
    for i in range(2):
        for proj, shape in (
            ("self_attn.q_proj", (d, d)), ("self_attn.k_proj", (d, d)),
            ("self_attn.v_proj", (d, d)), ("self_attn.o_proj", (d, d)),
            ("mlp.gate_proj", (inter, d)), ("mlp.up_proj", (inter, d)),
            ("mlp.down_proj", (d, inter)),
        ):
            sd[f"model.layers.{i}.{proj}.weight"] = (
                rng.standard_normal(shape).astype(np.float32) * 0.05
            )
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.ones((d,), np.float32)
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.ones((d,), np.float32)
    st.save_file(sd, str(tmp_path / "model.safetensors"))
    import json

    (tmp_path / "config.json").write_text(json.dumps({"vocab_size": v}))
    params = load_decoder_params(str(tmp_path), 2, quant="int4")
    lin = params["layers"][0]["mlp"]["gate"]
    assert set(lin) == {"w_p", "scale"} and lin["w_p"].shape == (inter, d // 2)
    # dequantized values match quantizing the source tensor directly
    want = quantize_linear_int4(sd["model.layers.0.mlp.gate_proj.weight"])
    np.testing.assert_array_equal(np.asarray(lin["w_p"]), np.asarray(want["w_p"]))


def test_int8_embed_table_gather():
    """dict-form embed tables (int4's implied int8 storage) dequantize the
    gathered rows to the quantizer's values, and a tied head reads the same
    dict through _linear's w_q branch."""
    from easyrag_tpu.models.decode import _lm_logits
    from easyrag_tpu.models.layers import embed

    rng = np.random.default_rng(5)
    cfg = tiny_cfg()
    table = rng.standard_normal((VOCAB, cfg.hidden_size)).astype(np.float32) * 0.04
    q = quantize_linear_int8(table)
    ids = jnp.asarray([[1, 5, 9, VOCAB - 1]], jnp.int32)
    got = np.asarray(embed(cfg, {"embed": q}, ids))
    want = (np.asarray(q["w_q"], np.float32)
            * np.asarray(q["scale"])[:, None])[np.asarray(ids)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # tied head: logits through the quantized table
    deq = np.asarray(q["w_q"], np.float32) * np.asarray(q["scale"])[:, None]
    h = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)).astype(np.float32))
    logits = np.asarray(_lm_logits(cfg, {"embed": q}, h))
    np.testing.assert_allclose(logits, np.asarray(h) @ deq.T, rtol=1e-4, atol=1e-5)


def test_int4_decode_matches_growing_forward():
    """The KV-cache decoder over an int4 tree emits the same tokens as the
    growing-forward oracle over the SAME int4 tree (decode algebra is
    quantization-agnostic)."""
    cfg = tiny_cfg(num_key_value_heads=2)
    params = init_params(cfg, jax.random.key(0))
    for layer in params["layers"]:
        for group in ("attn", "mlp"):
            for name in list(layer[group]):
                lin = layer[group][name]
                rest = {k: v for k, v in lin.items() if k != "w"}
                layer[group][name] = {
                    **quantize_linear_int4(np.asarray(lin["w"], np.float32)),
                    **rest,
                }
    prompt = [3, 1, 4, 1, 5, 9, 2]
    eos = [VOCAB - 1]
    want = oracle_greedy(cfg, params, prompt, 8, eos)
    got = run_cached(cfg, params, prompt, 8, eos)
    assert got == want


# ---- Pallas in-VMEM unpack matvec (ops/int4_matvec.py) --------------------
# Decode's bandwidth fix: HBM must see only the packed nibbles. Interpret
# mode pins the kernel's algebra on CPU; the TPU measurement lives in
# tools/bench_decode.py --quant int4.

from easyrag_tpu.ops.int4_matvec import int4_matvec, supported


def _oracle(x, p):
    w = unpack_int4(p["w_p"]).astype(jnp.float32)
    return (x.astype(jnp.float32) @ w.T) * p["scale"]


def test_int4_matvec_kernel_matches_dequant_oracle():
    rng = np.random.default_rng(7)
    for rows, n_out, n_in in [(1, 128, 256), (5, 256, 256), (8, 384, 512)]:
        w = rng.standard_normal((n_out, n_in)).astype(np.float32) * 0.05
        p = quantize_linear_int4(w)
        x = jnp.asarray(
            rng.standard_normal((rows, n_in)).astype(np.float32), jnp.bfloat16
        )
        got = int4_matvec(x, p["w_p"], p["scale"], interpret=True)
        assert got.shape == (rows, n_out) and got.dtype == x.dtype
        want = _oracle(x, p)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=1e-3
        )


def test_int4_matvec_support_gate():
    # lanes contract: half_in and n_out must be multiples of 128; row cap
    assert supported(1, 3584, 1792) and supported(8, 18944, 1792)
    assert not supported(0, 3584, 1792)
    assert not supported(128, 3584, 1792)  # compute-bound: XLA path
    assert not supported(1, 3584, 100)  # ragged lanes
    assert not supported(1, 100, 1792)  # ragged outputs


def test_linear_int4_routes_and_matches_on_3d_input():
    # _linear reshapes [B, S, d] through the kernel path on TPU; on CPU it
    # must keep using the XLA unpack — both equal the dequant oracle.
    rng = np.random.default_rng(8)
    w = rng.standard_normal((256, 256)).astype(np.float32) * 0.05
    p = quantize_linear_int4(w)
    p["b"] = jnp.asarray(rng.standard_normal((256,)).astype(np.float32))
    x = jnp.asarray(
        rng.standard_normal((2, 3, 256)).astype(np.float32), jnp.bfloat16
    )
    got = _linear(x, p)
    want = _oracle(x.reshape(6, 256), p).reshape(2, 3, 256) + np.asarray(p["b"])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_linear_int4_a8_matches_explicit_algebra():
    """w4a8 prefill form: dynamic per-token activation int8 against the
    unpacked nibble values (s8 x s8 -> s32, rank-1 rescale) must equal the
    explicit quant-dequant computation."""
    rng = np.random.default_rng(9)
    w = rng.standard_normal((40, 32)).astype(np.float32) * 0.05
    p = quantize_linear_int4(w)
    x = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
    got = np.asarray(_linear(x, p, a8=True), np.float32)

    w4 = np.asarray(unpack_int4(p["w_p"]), np.float32)
    xf = np.asarray(x, np.float32)
    xs = np.abs(xf).max(axis=-1, keepdims=True) / 127.0
    x_q = np.round(xf / xs)
    want = (x_q @ w4.T) * xs * np.asarray(p["scale"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_linear_int4_a8_skipped_at_kernel_shapes_on_every_backend():
    """w4a8 at decode-sized rows: the TPU kernel never activation-quantizes
    (bandwidth-bound), so the XLA fallback must skip the a8 branch at the
    SAME shapes — quant='w4a8' computes one function on CPU and TPU
    (advisor r4). At a kernel-supported shape, a8=True == weight-only."""
    rng = np.random.default_rng(10)
    w = rng.standard_normal((128, 256)).astype(np.float32) * 0.05
    p = quantize_linear_int4(w)  # n_out=128, half_in=128: kernel-supported
    x = jnp.asarray(
        rng.standard_normal((4, 256)).astype(np.float32), jnp.bfloat16
    )
    got_a8 = np.asarray(_linear(x, p, a8=True), np.float32)
    got_plain = np.asarray(_linear(x, p), np.float32)
    np.testing.assert_array_equal(got_a8, got_plain)

    # ...and at an UNsupported shape (rows > 64: prefill) a8 still applies
    xb = jnp.asarray(
        rng.standard_normal((80, 256)).astype(np.float32), jnp.bfloat16
    )
    assert not np.allclose(
        np.asarray(_linear(xb, p, a8=True), np.float32),
        np.asarray(_linear(xb, p), np.float32),
    )


def test_loader_w4a8_sets_act_quant_and_int4_leaves(tmp_path):
    """quant='w4a8' through JaxCausalLM: int4-packed matmuls + int8 embed
    (the int4 layout) AND cfg.act_quant on (the w8a8 prefill compute)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_gen_batch import tiny_causal_checkpoint  # noqa: F401
    # reuse the fixture machinery manually: build a tiny checkpoint
    import pytest

    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    out = tmp_path / "qwen2-tiny-w4a8"
    torch.manual_seed(3)
    hf_cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False, eos_token_id=61,
    )
    Qwen2ForCausalLM(hf_cfg).eval().float().save_pretrained(
        str(out), safe_serialization=True
    )
    from test_checkpoint_boot import _word_tokenizer

    tok = _word_tokenizer()
    tok.chat_template = (
        "{% for m in messages %}{{ m['content'] }} {% endfor %}"
        "{% if add_generation_prompt %}w0 {% endif %}"
    )
    tok.save_pretrained(str(out))

    from easyrag_tpu.models.decode import JaxCausalLM

    llm = JaxCausalLM(
        str(out), dtype=jnp.float32, quant="w4a8",
        max_new_tokens=4, buckets=(8,), max_batch=2,
    )
    assert llm.cfg.act_quant
    # JaxCausalLM fuses the int4 tree at load (hf_loader.fuse_decode_tree):
    # q+k+v land in one packed "qkv" entry, gate+up in "gateup"
    attn = llm.params["layers"][0]["attn"]
    assert "w_p" in attn["qkv"] and "q" not in attn
    assert "w_p" in llm.params["layers"][0]["mlp"]["gateup"]
    assert "w_q" in llm.params["embed"]
    text = llm.generate("w3 w1 w4")
    assert isinstance(text, str)
