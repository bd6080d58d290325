"""Tensor-parallel sharding of the decoder params over a mesh "model" axis.

Megatron-style layout via ``NamedSharding`` annotations — XLA inserts the
all-reduces (the scaling-book recipe; no hand-written collectives):

* q/k/v and gate/up projections: output dim sharded (column parallel)
* o and down projections: input dim sharded (row parallel)
* embeddings/norms/heads: replicated

Requires ``num_attention_heads % mp == 0`` (and kv heads likewise).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.layers import DecoderConfig


def shard_decoder_params(
    mesh: Mesh, cfg: DecoderConfig, params: Dict[str, Any], axis: str = "model"
) -> Dict[str, Any]:
    mp = mesh.shape[axis]
    if cfg.num_attention_heads % mp or cfg.num_key_value_heads % mp:
        raise ValueError(
            f"heads ({cfg.num_attention_heads}/{cfg.num_key_value_heads}) "
            f"not divisible by model-parallel size {mp}"
        )

    def ns(spec):
        return NamedSharding(mesh, spec)

    col_w, row_w = ns(P(axis, None)), ns(P(None, axis))
    col_b, rep = ns(P(axis)), ns(P())

    def shard_dense(p, col: bool):
        if "w_p" in p:
            # int4 (hf_loader.quantize_linear_int4): TP shards store the
            # nibble VALUES as int8 (same per-channel scales — w ≈
            # unpack * scale is exactly the w_q contract). The packed
            # halves layout cannot row-shard (each byte pairs input
            # columns i and i+I/2, which land on different devices), and
            # the Pallas unpack kernel is a single-device program; GSPMD
            # partitions the int8 matmul instead. Per-device HBM is still
            # half of bf16, and TP multiplies aggregate HBM anyway.
            from ..models.hf_loader import unpack_int4

            p = {"w_q": unpack_int4(p["w_p"]), **{
                k: v for k, v in p.items() if k != "w_p"
            }}
        if "w_q" in p:  # int8 weight-only (hf_loader.quantize_linear_int8)
            out = {
                "w_q": jax.device_put(p["w_q"], col_w if col else row_w),
                # per-OUTPUT-channel scales: sharded with the output dim in
                # column-parallel layers, replicated in row-parallel ones
                "scale": jax.device_put(p["scale"], col_b if col else rep),
            }
        else:
            out = {"w": jax.device_put(p["w"], col_w if col else row_w)}
        if "b" in p:
            out["b"] = jax.device_put(p["b"], col_b if col else rep)
        return out

    out: Dict[str, Any] = {
        "embed": jax.device_put(params["embed"], rep),
        "final_norm": jax.device_put(params["final_norm"], rep),
        "layers": [],
    }
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd

    def attn_parts(attn):
        if "qkv" in attn:
            # int4 fused tree (hf_loader.fuse_decode_tree): split the
            # packed rows back to name-addressed parts — Megatron column
            # sharding needs q and kv head groups split separately
            from ..models.hf_loader import unfuse_linear

            q, k, v = unfuse_linear(attn["qkv"], [nh * hd, nkv * hd, nkv * hd])
            return q, k, v
        return attn["q"], attn["k"], attn["v"]

    def mlp_parts(mlp_p):
        if "gateup" in mlp_p:
            from ..models.hf_loader import unfuse_linear

            inter = mlp_p["gateup"]["scale"].shape[0] // 2
            return unfuse_linear(mlp_p["gateup"], [inter, inter])
        return mlp_p["gate"], mlp_p["up"]

    for layer in params["layers"]:
        q_p, k_p, v_p = attn_parts(layer["attn"])
        gate_p, up_p = mlp_parts(layer["mlp"])
        new = {
            "attn": {
                "q": shard_dense(q_p, col=True),
                "k": shard_dense(k_p, col=True),
                "v": shard_dense(v_p, col=True),
                "o": shard_dense(layer["attn"]["o"], col=False),
            },
            "mlp": {
                "gate": shard_dense(gate_p, col=True),
                "up": shard_dense(up_p, col=True),
                "down": shard_dense(layer["mlp"]["down"], col=False),
            },
        }
        for key in layer:
            if key not in ("attn", "mlp"):
                new[key] = jax.device_put(layer[key], rep)
        out["layers"].append(new)
    for key in params:
        if key not in out:
            out[key] = jax.tree.map(lambda a: jax.device_put(a, rep), params[key])
    return out
