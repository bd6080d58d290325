"""Fused int4 q+k+v / gate+up matvecs (hf_loader.fuse_decode_tree).

The r5 decode decomposition (ROADMAP) put B=1 int4's whole gap to the
weight-read roofline INSIDE the matvec chain: 196 kernel dispatches per
28-layer step. q/k/v read the same activations, as do gate/up, so their
packed rows concatenate into one dispatch each (196 -> 112) with
bit-identical per-output-channel math — contraction, scale, and bias are
all row-local. These tests pin that identity: fused trees emit the same
tokens, the TP shard path splits fused rows back before Megatron
sharding, and the fusion gate never trades a kernel-supported unfused
shape for an unsupported fused one.

Reference scope: a layout transform on the quantized tree; generation
semantics of /root/reference/src/easyrag/utils/llm_utils.py:58-73 are
untouched.
"""

import numpy as np

import jax
import jax.numpy as jnp

from easyrag_tpu.models.hf_loader import (
    fuse_decode_tree,
    quantize_decoder_tree,
    quantize_linear_int4,
    unfuse_linear,
)
from easyrag_tpu.models.layers import init_params

from test_decode import VOCAB, oracle_greedy, run_cached, tiny_cfg


def _int4_tree(cfg, key, bias=False):
    params = init_params(cfg, key)
    if bias:
        rng = np.random.default_rng(7)
        for layer in params["layers"]:
            for name in ("q", "k", "v"):
                lin = layer["attn"][name]
                lin["b"] = jnp.asarray(
                    rng.standard_normal(lin["w"].shape[0]).astype(np.float32)
                    * 0.02
                )
    return quantize_decoder_tree(params, quant="int4")


def test_fuse_tree_structure_and_row_identity():
    cfg = tiny_cfg(num_key_value_heads=2)
    params = _int4_tree(cfg, jax.random.key(0), bias=True)
    fused = fuse_decode_tree(params)
    for orig, layer in zip(params["layers"], fused["layers"]):
        attn, mlp_p = layer["attn"], layer["mlp"]
        assert "qkv" in attn and "q" not in attn and "k" not in attn
        assert "gateup" in mlp_p and "gate" not in mlp_p and "up" not in mlp_p
        assert "o" in attn and "down" in mlp_p  # untouched row-parallel parts
        # fused rows are exactly the original rows, in q/k/v order
        want_wp = np.concatenate(
            [np.asarray(orig["attn"][n]["w_p"]) for n in ("q", "k", "v")]
        )
        np.testing.assert_array_equal(np.asarray(attn["qkv"]["w_p"]), want_wp)
        want_b = np.concatenate(
            [np.asarray(orig["attn"][n]["b"]) for n in ("q", "k", "v")]
        )
        np.testing.assert_allclose(np.asarray(attn["qkv"]["b"]), want_b)
        want_gu = np.concatenate(
            [np.asarray(orig["mlp"][n]["w_p"]) for n in ("gate", "up")]
        )
        np.testing.assert_array_equal(np.asarray(mlp_p["gateup"]["w_p"]), want_gu)
    # unfuse is the exact inverse
    nh, nkv, hd = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.hd,
    )
    q, k, v = unfuse_linear(
        fused["layers"][0]["attn"]["qkv"], [nh * hd, nkv * hd, nkv * hd]
    )
    for part, name in ((q, "q"), (k, "k"), (v, "v")):
        np.testing.assert_array_equal(
            np.asarray(part["w_p"]),
            np.asarray(params["layers"][0]["attn"][name]["w_p"]),
        )
        np.testing.assert_allclose(
            np.asarray(part["scale"]),
            np.asarray(params["layers"][0]["attn"][name]["scale"]),
        )


def test_fused_decode_tokens_match_unfused():
    """Same tokens from the fused and unfused trees — int4 and w4a8."""
    for act_quant in (False, True):
        cfg = tiny_cfg(num_key_value_heads=2, act_quant=act_quant)
        params = _int4_tree(cfg, jax.random.key(1), bias=True)
        fused = fuse_decode_tree(params)
        prompt = [3, 1, 4, 1, 5, 9, 2]
        eos = [VOCAB - 1]
        want = run_cached(cfg, params, prompt, 8, eos)
        got = run_cached(cfg, fused, prompt, 8, eos)
        assert got == want
        # and both still match the growing-forward oracle on the fused tree
        assert oracle_greedy(cfg, fused, prompt, 8, eos) == want


def test_fused_spec_decode_matches_plain():
    """Spec decode over a fused tree keeps the bit-exact greedy contract."""
    from easyrag_tpu.models.decode import generate_greedy_spec

    cfg = tiny_cfg(num_key_value_heads=2)
    fused = fuse_decode_tree(_int4_tree(cfg, jax.random.key(2)))
    prompt = [5, 2, 8, 2, 8, 2]
    eos = [VOCAB - 1]
    want = run_cached(cfg, fused, prompt, 7, eos)
    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones_like(ids)
    out = generate_greedy_spec(
        cfg, fused, ids, mask, jnp.asarray(eos, jnp.int32), 7, draft_len=3
    )
    assert list(np.asarray(out[0])) == want


def test_tp_shard_accepts_fused_tree():
    """shard_decoder_params splits fused rows back to Megatron parts; the
    sharded run matches the unsharded fused run token for token."""
    from jax.sharding import Mesh

    from easyrag_tpu.models.decode import generate_greedy
    from easyrag_tpu.parallel.tp import shard_decoder_params

    cfg = tiny_cfg(num_key_value_heads=4)
    params = _int4_tree(cfg, jax.random.key(3))
    fused = fuse_decode_tree(params)
    prompt = [8, 2, 7, 5, 1, 3]
    eos = [VOCAB - 1]
    want = run_cached(cfg, fused, prompt, 5, eos)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    tp_params = shard_decoder_params(mesh, cfg, fused, axis="model")
    assert "w_q" in tp_params["layers"][0]["attn"]["q"]  # unfused + unpacked
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


def test_fusion_gate_never_loses_kernel_support():
    """A group fuses only when the fused shape still rides the Pallas
    kernel — or when the unfused parts never did (then XLA computes the
    fused form just as well)."""
    from easyrag_tpu.ops.int4_matvec import supported

    # production Qwen2-7B shapes: fused qkv and gateup stay supported
    assert supported(1, 3584 + 512 + 512, 3584 // 2)
    assert supported(1, 2 * 18944, 3584 // 2)
    # tiny test shapes: unfused unsupported (half_in % 128 != 0) -> fuse
    cfg = tiny_cfg()
    fused = fuse_decode_tree(_int4_tree(cfg, jax.random.key(4)))
    assert "qkv" in fused["layers"][0]["attn"]

    # adversarial shape: unfused supported but fused sum not divisible by
    # any block -> group must stay unfused
    w_ok = np.random.default_rng(0).standard_normal((128, 256)).astype(np.float32)
    w_odd = np.random.default_rng(1).standard_normal((384, 256)).astype(np.float32)
    tree = {
        "layers": [
            {
                "attn": {
                    "q": quantize_linear_int4(w_ok),
                    "k": quantize_linear_int4(w_odd),
                    "v": quantize_linear_int4(w_odd),
                    "o": quantize_linear_int4(w_ok),
                },
                "mlp": {},
            }
        ]
    }
    n_sum = 128 + 384 + 384  # 896: % 128 == 0 and supported -> fuses
    assert supported(1, n_sum, 128)
    out = fuse_decode_tree(tree)
    assert "qkv" in out["layers"][0]["attn"]


def test_fused_tree_in_decode_pool_matches_solo():
    """The serving path: a fused int4 tree through the continuous-batching
    decode pool emits the same tokens as a solo run on the same tree."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_decode_pool import StubLLM, harvest, solo

    from easyrag_tpu.models.decode_pool import DecodePool

    cfg = tiny_cfg(num_key_value_heads=2)
    fused = fuse_decode_tree(_int4_tree(cfg, jax.random.key(8)))
    llm = StubLLM(cfg, fused, buckets=(4, 8), max_new=5)
    pool = DecodePool(llm, pool_size=2, chunk_steps=2)
    prompts = {"a": [3, 1, 4], "b": [1, 5, 9, 2, 6, 5]}
    results = {}
    pool.insert(prompts["a"], "a")
    harvest(pool, results)
    pool.insert(prompts["b"], "b")
    while pool.active:
        harvest(pool, results)
    for name, prompt in prompts.items():
        assert results[name] == solo(llm, prompt), name


def test_fuse_skips_mixed_bias_and_non_int4():
    """bf16 trees and groups with inconsistent bias presence pass through."""
    cfg = tiny_cfg()
    bf16 = init_params(cfg, jax.random.key(5))
    out = fuse_decode_tree(bf16)
    assert "q" in out["layers"][0]["attn"] and "qkv" not in out["layers"][0]["attn"]

    tree = quantize_decoder_tree(init_params(cfg, jax.random.key(6)), quant="int4")
    tree["layers"][0]["attn"]["q"]["b"] = jnp.zeros(
        tree["layers"][0]["attn"]["q"]["scale"].shape[0]
    )
    out = fuse_decode_tree(tree)
    assert "qkv" not in out["layers"][0]["attn"]  # mixed bias: stay unfused
    assert "gateup" in out["layers"][0]["mlp"]  # mlp still fuses
