"""HuggingFace checkpoint -> JAX param pytree.

Loads ``config.json`` + ``*.safetensors`` from a *local* model directory
(this environment has no network egress; weights must be pre-downloaded,
as the reference's ``scripts/download.sh`` also assumes) and maps the
llama-family parameter names onto the pytree consumed by
``models/layers.py``:

  (model.)embed_tokens.weight                      -> embed
  (model.)layers.{i}.self_attn.{q,k,v,o}_proj.*    -> layers[i].attn.*
  (model.)layers.{i}.mlp.{gate,up,down}_proj.weight-> layers[i].mlp.*
  (model.)layers.{i}.input_layernorm.weight        -> layers[i].input_norm
  (model.)layers.{i}.post_attention_layernorm.*    -> layers[i].post_norm
  (model.)norm.weight                              -> final_norm
  lm_head.{j}.linear_head.weight                   -> heads[start_layer+j]
  (gemma2: pre_feedforward/post_feedforward/post_attention norms map to
   pre_mlp_norm/post_mlp_norm/post_attn_norm)
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def load_hf_config(model_dir: str) -> Dict[str, Any]:
    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        return json.load(f)


def _safetensor_files(model_dir: str):
    """Shard file list: the ``model.safetensors.index.json`` weight_map when
    present (the canonical multi-file layout real 7B checkpoints ship,
    e.g. gte-Qwen2-7B-instruct's model-0000x-of-0000N shards), else a glob."""
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path, encoding="utf-8") as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
        return [os.path.join(model_dir, name) for name in files]
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    return files


def _iter_safetensors(model_dir: str):
    """Stream tensors shard by shard — one shard resident at a time, so a
    sharded 7B checkpoint never needs full-checkpoint host memory."""
    from safetensors import safe_open

    for path in _safetensor_files(model_dir):
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _strip_prefix(name: str) -> str:
    return name[6:] if name.startswith("model.") else name


_NORM_MAP = {
    "input_layernorm": "input_norm",
    "post_attention_layernorm": "post_norm",
    "pre_feedforward_layernorm": "pre_mlp_norm",
    "post_feedforward_layernorm": "post_mlp_norm",
}

_GEMMA_NORM_MAP = {
    "input_layernorm": "input_norm",
    "post_attention_layernorm": "post_attn_norm",
    "pre_feedforward_layernorm": "pre_mlp_norm",
    "post_feedforward_layernorm": "post_mlp_norm",
}


def quantize_linear_int8(tensor: np.ndarray) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 weight quantization.

    ``w ≈ w_q * scale[:, None]`` with ``scale = max|row| / 127``. 4x the HBM
    headroom of f32 (2x vs bf16) — the knob SURVEY §7 flags for fitting the
    7B embedder next to a large resident index on one chip's HBM. Dequant
    fuses into the matmul (``layers._linear``): MXU-friendly, no separate
    dequant pass materialized.
    """
    w = np.asarray(tensor, dtype=np.float32)
    scale = np.abs(w).max(axis=1) / 127.0
    scale = np.where(scale == 0.0, 1.0, scale)
    w_q = np.clip(np.rint(w / scale[:, None]), -127, 127).astype(np.int8)
    return {
        "w_q": jnp.asarray(w_q),
        "scale": jnp.asarray(scale, jnp.float32),
    }


def quantize_linear_int4(tensor: np.ndarray) -> Dict[str, Any]:
    """Symmetric per-output-channel int4 weight quantization, nibble-packed.

    ``w ≈ unpack(w_p) * scale[:, None]`` with ``scale = max|row| / 7``;
    two 4-bit values ride per int8 byte along the input dim in the
    *deinterleaved-halves* layout: ``w_p[o, i]`` holds column ``i`` (low
    nibble) and column ``i + I/2`` (high nibble), so unpacking is two
    full-tile shifts with no lane interleave — the layout
    ``ops/int4_matvec.py`` streams packed through VMEM. 4x the HBM
    headroom of bf16 — the co-residency knob that lets the 7B generator
    live next to the 7B embedder + reranker + indexes on one 16 GB chip
    (VERDICT r3 item #1). Decode-shape matmuls route through the Pallas
    in-VMEM unpack kernel (``ops/int4_matvec.py``) so HBM sees only the
    packed bytes; the XLA shift/mask path — which materializes the unpack
    between HBM and the matmul, measured 16.3 ms/step at 7B, WORSE than
    int8's 9.9 — remains the prefill/CPU fallback.
    Per-channel scales keep the dequant a rank-1 epilogue rescale
    (group-128 scales cannot factor out of the contraction and would
    materialize the bf16 tree at prefill shapes). Quality: ~16x coarser
    rounding than int8 — real-checkpoint score/answer parity is the
    standing environment-blocked gate (no weights in this image).
    """
    w = np.asarray(tensor, dtype=np.float32)
    assert w.shape[1] % 2 == 0, "int4 packing needs an even input dim"
    scale = np.abs(w).max(axis=1) / 7.0
    scale = np.where(scale == 0.0, 1.0, scale)
    w4 = np.clip(np.rint(w / scale[:, None]), -7, 7).astype(np.int8)
    half = w.shape[1] // 2
    packed = (w4[:, :half] & 0xF) | ((w4[:, half:] & 0xF) << 4)
    return {
        "w_p": jnp.asarray(packed.astype(np.int8)),
        "scale": jnp.asarray(scale, jnp.float32),
    }


def quantize_linear_int4_device(w: jnp.ndarray) -> Dict[str, Any]:
    """Jittable device-side twin of :func:`quantize_linear_int4` (benches
    generate params on device; parity pinned in ``tests/test_int4.py``)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=1) / 7.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    half = w.shape[1] // 2
    w4 = jnp.clip(jnp.rint(wf / scale[:, None]), -7, 7).astype(jnp.int8)
    packed = (w4[:, :half] & 0xF) | ((w4[:, half:] & 0xF) << 4)
    return {"w_p": packed.astype(jnp.int8), "scale": scale}


def unpack_int4(w_p: jnp.ndarray) -> jnp.ndarray:
    """[O, I/2] packed nibbles -> [O, I] int8 (sign-extended).

    Halves layout: low nibbles are columns [0, I/2), high nibbles are
    columns [I/2, I) — a concat, not an interleave (see int4_matvec)."""
    lo = (w_p << 4).astype(jnp.int8) >> 4  # arithmetic shifts sign-extend
    hi = w_p >> 4
    return jnp.concatenate([lo, hi], axis=1)


def quantize_linear_int8_device(w: jnp.ndarray) -> Dict[str, Any]:
    """Jittable device-side twin of :func:`quantize_linear_int8`.

    Same conventions (per-output-channel symmetric scales, zero rows get
    scale 1.0, clip to ±127) so benches that generate params on device —
    uploading gigabytes through a slow attachment is not an option — apply
    exactly the production quantization semantics. Parity is pinned in
    ``tests/test_w8a8.py``.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=1) / 127.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    w_q = jnp.clip(jnp.rint(wf / scale[:, None]), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale}


def _fuse_packed_group(parts) -> Optional[Dict[str, Any]]:
    """Concatenate int4-packed linears along the OUTPUT dim (or None).

    Valid only when every part is the ``w_p`` form with the same input
    width (they all consume the same activations) and bias presence
    agrees. Per-output-channel scales/biases concatenate with the rows,
    so the fused matvec computes exactly the same per-channel values.
    """
    if not all("w_p" in p for p in parts):
        return None
    if len({int(p["w_p"].shape[1]) for p in parts}) != 1:
        return None
    has_b = ["b" in p for p in parts]
    if any(has_b) != all(has_b):
        return None
    fused = {
        "w_p": jnp.concatenate([p["w_p"] for p in parts], axis=0),
        "scale": jnp.concatenate([p["scale"] for p in parts], axis=0),
    }
    if all(has_b):
        fused["b"] = jnp.concatenate([p["b"] for p in parts], axis=0)
    return fused


def fuse_decode_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse q+k+v and gate+up int4 linears into one packed matrix each.

    B=1 int4 decode's entire gap to the weight-read roofline lives in
    per-kernel dispatch overhead (ROADMAP: the r5 decomposition measured
    matvecs-only at 5.87 of the 6.38 ms step — 196 dispatches averaging
    66% of HBM bandwidth; argmax/rope/cache/glue cost ~nothing). q, k, v
    read the same activations, as do gate and up, so concatenating their
    packed rows turns 7 matvec dispatches per layer into 4 (196 -> 112
    per 28-layer step) with bit-identical per-output-channel math: the
    contraction, the per-channel scale, and the bias are all row-local.
    The fused entries replace the originals (``attn.qkv``, ``mlp.gateup``)
    so HBM holds one copy; ``layers.mlp`` / ``decode._qkv`` split the
    output columns, and ``parallel.tp.shard_decoder_params`` splits the
    rows back to name-addressed parts before Megatron sharding.

    A group is only fused when the fused shape still rides the Pallas
    in-VMEM unpack kernel (``ops.int4_matvec.supported``) — or when the
    unfused parts never did (tiny/CPU shapes, where the XLA path computes
    the fused form just as well). Never worse than unfused.

    Reference scope: generation semantics of
    ``/root/reference/src/easyrag/utils/llm_utils.py:58-73`` are
    unchanged — this is a layout transform on the quantized tree.
    """
    from ..ops import int4_matvec as i4

    def should_fuse(parts) -> bool:
        half = int(parts[0]["w_p"].shape[1])
        outs = [int(p["w_p"].shape[0]) for p in parts]
        if i4.supported(1, sum(outs), half):
            return True
        return not all(i4.supported(1, o, half) for o in outs)

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new = dict(layer)
        attn = layer.get("attn", {})
        if all(k in attn for k in ("q", "k", "v")):
            fused = _fuse_packed_group([attn["q"], attn["k"], attn["v"]])
            if fused is not None and should_fuse([attn["q"], attn["k"], attn["v"]]):
                new["attn"] = {
                    "qkv": fused,
                    **{k: v for k, v in attn.items() if k not in ("q", "k", "v")},
                }
        mlp_p = layer.get("mlp", {})
        if "gate" in mlp_p and "up" in mlp_p:
            fused = _fuse_packed_group([mlp_p["gate"], mlp_p["up"]])
            if fused is not None and should_fuse([mlp_p["gate"], mlp_p["up"]]):
                new["mlp"] = {
                    "gateup": fused,
                    **{k: v for k, v in mlp_p.items() if k not in ("gate", "up")},
                }
        out["layers"].append(new)
    return out


def unfuse_linear(fused: Dict[str, Any], outs) -> list:
    """Split a fused packed linear back into row blocks of sizes ``outs``."""
    parts = []
    start = 0
    for n in outs:
        part = {
            "w_p": fused["w_p"][start : start + n],
            "scale": fused["scale"][start : start + n],
        }
        if "b" in fused:
            part["b"] = fused["b"][start : start + n]
        parts.append(part)
        start += n
    return parts


def quantize_decoder_tree(
    params: Dict[str, Any], quant: str = "int8"
) -> Dict[str, Any]:
    """Quantize every attn/mlp linear in an in-memory layers.py pytree.

    The streaming loader quantizes at load time; this covers params that
    already live in memory (tests, dryruns, init_params trees). Embeddings,
    norms, and biases pass through untouched. ``quant``: int8 | int4.
    """
    quantize = {"int8": quantize_linear_int8, "int4": quantize_linear_int4}[quant]
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        q: Dict[str, Any] = {}
        for key, val in layer.items():
            if key in ("attn", "mlp"):
                q[key] = {
                    name: {
                        **quantize(np.asarray(p["w"], np.float32)),
                        **({"b": p["b"]} if "b" in p else {}),
                    }
                    if "w" in p
                    else p
                    for name, p in val.items()
                }
            else:
                q[key] = val
        out["layers"].append(q)
    return out


def load_decoder_params(
    model_dir: str,
    num_layers: int,
    start_layer: Optional[int] = None,
    gemma: bool = False,
    head_layer_sep: int = 1,
    dtype=jnp.bfloat16,
    quant: str = "",
) -> Dict[str, Any]:
    """Stream safetensors into the layers.py pytree (bf16 by default).

    ``quant="int8"`` stores the 2-D matmul weights (attention + MLP
    projections) as int8 with per-channel scales; embeddings, norms, biases,
    and score heads stay in ``dtype``/f32 (they are small and
    precision-critical). Quantization happens tensor-by-tensor during the
    stream, so peak host memory stays one shard + one tensor.
    """
    if quant not in ("", "int8", "w8a8", "int4", "w4a8"):
        raise ValueError(
            f"quant must be '', 'int8', 'w8a8', 'int4' or 'w4a8', got {quant!r}"
        )
    layers: list = [
        {"attn": {}, "mlp": {}} for _ in range(num_layers)
    ]
    params: Dict[str, Any] = {"layers": layers}
    heads: Dict[int, Any] = {}
    norm_map = _GEMMA_NORM_MAP if gemma else _NORM_MAP

    def put(tensor: np.ndarray):
        return jnp.asarray(tensor).astype(dtype)

    def put_linear(tensor: np.ndarray) -> Dict[str, Any]:
        if quant in ("int8", "w8a8"):  # w8a8 stores the same int8 weights;
            return quantize_linear_int8(tensor)  # activations quantize at
        if quant in ("int4", "w4a8"):  # run time (DecoderConfig.act_quant)
            return quantize_linear_int4(tensor)
        return {"w": put(tensor)}

    for raw_name, tensor in _iter_safetensors(model_dir):
        name = _strip_prefix(raw_name)
        parts = name.split(".")
        if name == "embed_tokens.weight":
            # int4 implies an int8 embed table (per-row scales; dequant on
            # the gathered rows, layers.embed) — the point of int4 is HBM,
            # and the bf16 table is ~1 GB at 7B scale
            params["embed"] = (
                quantize_linear_int8(tensor)
                if quant in ("int4", "w4a8")
                else put(tensor)
            )
        elif name == "norm.weight":
            params["final_norm"] = put(tensor)
        elif parts[0] == "lm_head":
            # layerwise heads: lm_head.{j}.linear_head.weight (f32 heads)
            if parts[1].isdigit():
                j = int(parts[1])
                heads[(start_layer or 0) + j * head_layer_sep] = jnp.asarray(
                    tensor
                ).astype(jnp.float32)
            else:  # plain causal-lm head (e.g. 'Yes'-logit rerankers, the
                # local LLM) — quantized like any linear: at decode time
                # the head matmul reads the whole [V, D] table every step
                # (1.04 GB bf16 at Qwen2-7B ≈ 15% of the step's bytes)
                params["lm_head"] = put_linear(tensor)
        elif parts[0] == "layers":
            i = int(parts[1])
            if i >= num_layers:
                continue
            sub = parts[2]
            if sub == "self_attn":
                proj = parts[3][0]  # q/k/v/o
                if parts[4] == "weight":
                    layers[i]["attn"].setdefault(proj, {}).update(
                        put_linear(tensor)
                    )
                else:
                    layers[i]["attn"].setdefault(proj, {})["b"] = put(tensor)
            elif sub == "mlp":
                proj = parts[3].split("_")[0]  # gate/up/down
                layers[i]["mlp"][proj] = put_linear(tensor)
            elif sub in norm_map:
                layers[i][norm_map[sub]] = put(tensor)
    if heads:
        params["heads"] = heads
    return params


def params_from_state_dict(
    state_dict: Dict[str, np.ndarray],
    num_layers: int,
    start_layer: Optional[int] = None,
    gemma: bool = False,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """In-memory variant of :func:`load_decoder_params` (tests, conversions)."""
    layers: list = [{"attn": {}, "mlp": {}} for _ in range(num_layers)]
    params: Dict[str, Any] = {"layers": layers}
    heads: Dict[int, Any] = {}
    norm_map = _GEMMA_NORM_MAP if gemma else _NORM_MAP
    for raw_name, tensor in state_dict.items():
        tensor = np.asarray(tensor)
        name = _strip_prefix(raw_name)
        parts = name.split(".")
        if name == "embed_tokens.weight":
            params["embed"] = jnp.asarray(tensor, dtype)
        elif name == "norm.weight":
            params["final_norm"] = jnp.asarray(tensor, dtype)
        elif parts[0] == "lm_head":
            if parts[1].isdigit():
                heads[(start_layer or 0) + int(parts[1])] = jnp.asarray(
                    tensor, jnp.float32
                )
            else:
                params["lm_head"] = jnp.asarray(tensor, dtype)
        elif parts[0] == "layers":
            i = int(parts[1])
            if i >= num_layers:
                continue
            sub = parts[2]
            if sub == "self_attn":
                proj = parts[3][0]
                kind = "w" if parts[4] == "weight" else "b"
                layers[i]["attn"].setdefault(proj, {})[kind] = jnp.asarray(tensor, dtype)
            elif sub == "mlp":
                proj = parts[3].split("_")[0]
                layers[i]["mlp"][proj] = {"w": jnp.asarray(tensor, dtype)}
            elif sub in norm_map:
                layers[i][norm_map[sub]] = jnp.asarray(tensor, dtype)
    if heads:
        params["heads"] = heads
    return params


def load_qwen2_embedder(model_dir: str, dtype=jnp.bfloat16, quant: str = ""):
    """gte-Qwen2 checkpoint -> (DecoderConfig, params)."""
    from .qwen2 import qwen2_config_from_hf

    hf = load_hf_config(model_dir)
    cfg = qwen2_config_from_hf(hf, dtype=dtype)
    if quant in ("w8a8", "w4a8"):
        import dataclasses

        cfg = dataclasses.replace(cfg, act_quant=True)
    params = load_decoder_params(
        model_dir, cfg.num_hidden_layers, dtype=dtype, quant=quant
    )
    return cfg, params


def load_minicpm_reranker(model_dir: str, dtype=jnp.bfloat16, quant: str = ""):
    """bge-reranker-v2-minicpm-layerwise checkpoint -> (cfg, params, start)."""
    from .minicpm import minicpm_config_from_hf

    hf = load_hf_config(model_dir)
    cfg = minicpm_config_from_hf(hf, dtype=dtype)
    if quant in ("w8a8", "w4a8"):
        import dataclasses

        cfg = dataclasses.replace(cfg, act_quant=True)
    start_layer = hf.get("start_layer", 8)
    params = load_decoder_params(
        model_dir, cfg.num_hidden_layers, start_layer=start_layer, dtype=dtype,
        quant=quant,
    )
    return cfg, params, start_layer
