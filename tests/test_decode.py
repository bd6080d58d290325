"""KV-cache greedy decode vs the growing-forward oracle.

The oracle re-runs :func:`forward_hidden` over the whole (prompt + emitted)
sequence each step and argmaxes the last logit — exactly what the
reference's HF ``model.generate(top_k=1)`` computes
(``/root/reference/src/easyrag/utils/llm_utils.py:58-73``). The cached
decoder must emit the identical token sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyrag_tpu.models.decode import _lm_logits, generate_greedy
from easyrag_tpu.models.layers import DecoderConfig, forward_hidden, init_params

VOCAB = 97  # prime-ish: argmax collisions across shapes are unlikely


def tiny_cfg(**kw):
    base = dict(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        dtype=jnp.float32,
    )
    base.update(kw)
    return DecoderConfig(**base)


def oracle_greedy(cfg, params, prompt, max_new, eos_ids):
    """Re-forward the growing sequence each step (the HF generate cost
    model); stops after emitting an EOS, pads with eos_ids[0]."""
    seq = list(prompt)
    out = []
    for _ in range(max_new):
        ids = jnp.asarray([seq], jnp.int32)
        mask = jnp.ones_like(ids)
        h = forward_hidden(cfg, params, ids, mask)
        tok = int(jnp.argmax(_lm_logits(cfg, params, h[:, -1]), axis=-1)[0])
        out.append(tok)
        if tok in eos_ids:
            break
        seq.append(tok)
    return out + [eos_ids[0]] * (max_new - len(out))


def run_cached(cfg, params, prompt, max_new, eos_ids, bucket=None):
    bucket = bucket or len(prompt)
    pad = bucket - len(prompt)
    ids = jnp.asarray([[0] * pad + list(prompt)], jnp.int32)
    mask = jnp.asarray([[0] * pad + [1] * len(prompt)], jnp.int32)
    out = generate_greedy(
        cfg, params, ids, mask, jnp.asarray(eos_ids, jnp.int32), max_new
    )
    return list(np.asarray(out[0]))


@pytest.mark.parametrize(
    "kw",
    [
        {},  # plain llama-family (qwen2 minus bias)
        {"attention_bias": True},  # qwen2
        {"num_key_value_heads": 2},  # GQA
        {"scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 256.0},  # minicpm
        {"gemma": True, "attn_logit_softcapping": 50.0, "query_pre_attn_scalar": 8.0},
    ],
)
def test_cached_decode_matches_growing_forward(kw):
    cfg = tiny_cfg(**kw)
    params = init_params(cfg, jax.random.key(0))
    prompt = [3, 1, 4, 1, 5, 9, 2]
    eos = [VOCAB - 1]
    want = oracle_greedy(cfg, params, prompt, 8, eos)
    got = run_cached(cfg, params, prompt, 8, eos)
    assert got == want


def test_left_padding_invariance():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(1))
    prompt = [7, 7, 2, 9]
    eos = [VOCAB - 1]
    unpadded = run_cached(cfg, params, prompt, 6, eos)
    padded = run_cached(cfg, params, prompt, 6, eos, bucket=16)
    assert padded == unpadded


def test_batch_rows_independent():
    cfg = tiny_cfg(num_key_value_heads=2)
    params = init_params(cfg, jax.random.key(2))
    eos = [VOCAB - 1]
    p1, p2 = [5, 3, 8], [11, 4, 6, 2, 9, 1]
    bucket = 8
    rows, masks = [], []
    for p in (p1, p2):
        pad = bucket - len(p)
        rows.append([0] * pad + p)
        masks.append([0] * pad + [1] * len(p))
    out = generate_greedy(
        cfg,
        params,
        jnp.asarray(rows, jnp.int32),
        jnp.asarray(masks, jnp.int32),
        jnp.asarray(eos, jnp.int32),
        5,
    )
    for row, p in zip(np.asarray(out), (p1, p2)):
        assert list(row) == run_cached(cfg, params, p, 5, eos, bucket=bucket)


def test_eos_stops_and_fills():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(3))
    prompt = [2, 4, 6]
    free = oracle_greedy(cfg, params, prompt, 6, eos_ids=[-1])  # never stops
    eos = [free[2]]  # force a stop at the 3rd emitted token
    got = run_cached(cfg, params, prompt, 6, eos)
    assert got[:3] == free[:3]
    assert got[3:] == [eos[0]] * 3
    # the emitted EOS is kept in-place (callers split on it)
    assert got[2] == eos[0]


def test_lm_head_untied_and_minicpm_scaling():
    """With an explicit lm_head the logits must use it (not the embed
    table), and MiniCPM's hidden/(d/dim_model_base) scaling must apply."""
    cfg = tiny_cfg(dim_model_base=256.0)
    params = init_params(cfg, jax.random.key(4))
    params["lm_head"] = jax.random.normal(
        jax.random.key(5), (VOCAB, cfg.hidden_size), jnp.float32
    )
    h = jax.random.normal(jax.random.key(6), (2, cfg.hidden_size), jnp.float32)
    got = np.asarray(_lm_logits(cfg, params, h))
    want = (h / (cfg.hidden_size / 256.0)) @ params["lm_head"].T
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5)


def test_jax_causal_lm_matches_hf_generate(tmp_path):
    """End-to-end through a real on-disk checkpoint: JaxCausalLM (f32, no
    quant) must emit the same greedy tokens as HF ``model.generate`` — the
    reference's exact local path (llm_utils.py:58-73)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from easyrag_tpu.models.decode import JaxCausalLM

    out = tmp_path / "qwen2-tiny-causal"
    torch.manual_seed(7)
    hf_cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False, eos_token_id=61,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval().float()
    model.save_pretrained(str(out), safe_serialization=True)

    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_checkpoint_boot import _word_tokenizer

    tok = _word_tokenizer()
    tok.chat_template = (
        "{% for m in messages %}{{ m['content'] }} {% endfor %}"
        "{% if add_generation_prompt %}w0 {% endif %}"
    )
    tok.save_pretrained(str(out))

    llm = JaxCausalLM(
        str(out), dtype=jnp.float32, quant="", max_new_tokens=8,
        buckets=(8, 16, 32),
    )
    query = "w3 w1 w4 w1 w5"
    got = llm.generate(query)

    ids = tok.apply_chat_template(
        [{"role": "user", "content": query}],
        add_generation_prompt=True, return_tensors="pt",
    )
    with torch.no_grad():
        hf_out = model.generate(
            ids, max_new_tokens=8, do_sample=False, top_k=1,
            eos_token_id=61, pad_token_id=61,
        )
    want = tok.decode(hf_out[0][ids.shape[1]:], skip_special_tokens=True)
    assert got == want


def test_tp_decode_matches_single_device():
    """Tensor-parallel generation: params sharded Megatron-style over a
    'model' mesh axis (parallel/tp.py NamedSharding annotations, XLA
    inserts the all-reduces) must emit the same greedy tokens as the
    unsharded run."""
    from jax.sharding import Mesh

    from easyrag_tpu.parallel.tp import shard_decoder_params

    cfg = tiny_cfg(num_key_value_heads=4)
    params = init_params(cfg, jax.random.key(9))
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    eos = [VOCAB - 1]
    want = run_cached(cfg, params, prompt, 6, eos)

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("model",))
    tp_params = shard_decoder_params(mesh, cfg, params, axis="model")
    with mesh:
        out = generate_greedy(
            cfg,
            tp_params,
            jnp.asarray([prompt], jnp.int32),
            jnp.ones((1, len(prompt)), jnp.int32),
            jnp.asarray(eos, jnp.int32),
            6,
        )
    assert list(np.asarray(out[0])) == want


def test_tp_decode_int8_weights():
    """Same under int8 weight-only params (the production local-LLM
    config): sharded scales ride the column dim."""
    from jax.sharding import Mesh

    from easyrag_tpu.models.hf_loader import quantize_decoder_tree
    from easyrag_tpu.parallel.tp import shard_decoder_params

    cfg = tiny_cfg(num_key_value_heads=4)
    params = quantize_decoder_tree(init_params(cfg, jax.random.key(10)))
    prompt = [8, 2, 7, 5]
    eos = [VOCAB - 1]
    want = run_cached(cfg, params, prompt, 5, eos)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    tp_params = shard_decoder_params(mesh, cfg, params, axis="model")
    with mesh:
        out = generate_greedy(
            cfg,
            tp_params,
            jnp.asarray([prompt], jnp.int32),
            jnp.ones((1, len(prompt)), jnp.int32),
            jnp.asarray(eos, jnp.int32),
            5,
        )
    assert list(np.asarray(out[0])) == want


def test_w8a8_decode_matches_growing_forward():
    """The quantized decode path (int8 weights + per-token activation
    quant) must agree with the SAME-quantized growing-forward oracle —
    the cache introduces no additional quantization error."""
    import dataclasses

    from easyrag_tpu.models.hf_loader import quantize_decoder_tree

    cfg = dataclasses.replace(tiny_cfg(num_key_value_heads=2), act_quant=True)
    params = quantize_decoder_tree(
        init_params(dataclasses.replace(cfg, act_quant=False), jax.random.key(11))
    )
    prompt = [4, 9, 3, 7, 1]
    eos = [VOCAB - 1]
    want = oracle_greedy(cfg, params, prompt, 6, eos)
    got = run_cached(cfg, params, prompt, 6, eos)
    assert got == want


def test_tp_decode_int4_weights():
    """int4 params under TP: shard_decoder_params stores the nibble VALUES
    as int8 per shard (the packed halves layout can't row-shard — each
    byte pairs input columns i and i+I/2 — and the Pallas unpack kernel is
    a single-device program), so GSPMD partitions an int8 matmul with the
    SAME dequantized values: tokens must match the unsharded int4 run."""
    from jax.sharding import Mesh

    from easyrag_tpu.models.hf_loader import quantize_decoder_tree
    from easyrag_tpu.parallel.tp import shard_decoder_params

    cfg = tiny_cfg(num_key_value_heads=4)
    params = quantize_decoder_tree(
        init_params(cfg, jax.random.key(12)), quant="int4"
    )
    assert any(
        "w_p" in layer["attn"]["q"] for layer in params["layers"]
    )
    prompt = [8, 2, 7, 5, 1, 3]
    eos = [VOCAB - 1]
    want = run_cached(cfg, params, prompt, 5, eos)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    tp_params = shard_decoder_params(mesh, cfg, params, axis="model")
    # shards carry unpacked int8 nibble values, identical scales
    assert "w_q" in tp_params["layers"][0]["attn"]["q"]
    with mesh:
        out = generate_greedy(
            cfg,
            tp_params,
            jnp.asarray([prompt], jnp.int32),
            jnp.ones((1, len(prompt)), jnp.int32),
            jnp.asarray(eos, jnp.int32),
            5,
        )
    assert list(np.asarray(out[0])) == want
