"""Model registry: name/path -> embedder / reranker instances.

Mirrors the reference's name-based dispatch
(``src/easyrag/pipeline/pipeline.py:100-118`` for embeddings,
``src/easyrag/custom/rerankers.py:142-184`` for rerankers). Weights must be
local directories (zero-egress environment); a missing path raises with a
clear instruction instead of attempting a download.
"""

from __future__ import annotations

import os


def _require_local(name: str, kind: str) -> str:
    if os.path.isdir(name):
        return name
    raise FileNotFoundError(
        f"{kind} weights not found at '{name}'. This environment has no "
        "network egress; download the checkpoint ahead of time (see the "
        "reference's scripts/download.sh) and point the config at the local "
        "directory, or inject a model instance into EasyRAGPipeline."
    )


def _load_tokenizer(model_dir: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_dir, trust_remote_code=True)


def load_embedder(
    name: str,
    cache_folder: str = "",
    embed_type: int = 0,
    mesh=None,
    quant: str = "",
):
    """Dense embedder by name. GTE/Zhihui names use the Qwen2 last-token-pool
    contract (``pipeline.py:100-108``); other names use a mean-pool
    sentence-transformers-style contract (``pipeline.py:109-115``).

    With a mesh carrying a >1 "model" axis, the decoder weights shard
    tensor-parallel over it (the 7B embedder next to a large index is the
    HBM-pressure case SURVEY.md §7 flags)."""
    model_dir = _require_local(name, "embedding model")
    if "gte" in name or "Zhihui" in name:
        import dataclasses

        import jax

        from .hf_loader import load_qwen2_embedder
        from .qwen2 import GTEEmbedder

        cfg, params = load_qwen2_embedder(model_dir, quant=quant)
        # flash attention on TPU when the head dim tiles onto the lanes
        # (gte-Qwen2-7B: head_dim 128); falls back to einsum otherwise
        if jax.default_backend() != "cpu" and cfg.hd % 128 == 0:
            cfg = dataclasses.replace(cfg, use_flash=True)
        if mesh is not None and "model" in mesh.axis_names and mesh.shape["model"] > 1:
            from ..parallel.tp import shard_decoder_params

            params = shard_decoder_params(mesh, cfg, params, axis="model")
        return GTEEmbedder(
            cfg, params, _load_tokenizer(model_dir), embed_type=embed_type,
            embed_batch_size=128,
        )
    from .st_embedder import STEmbedder

    return STEmbedder.from_pretrained(model_dir, embed_type=embed_type)


def load_reranker(
    name: str,
    top_n: int = 6,
    embed_bs: int = 32,
    embed_type: int = 0,
    use_efficient: int = 0,
    use_st: bool = False,
    quant: str = "",
    cascade_keep: int = 32,
    cascade_carry: bool = False,
):
    """Reranker by name (``rerankers.py:142-184`` dispatch)."""
    from ..rerankers import LLMRerank, SentenceTransformerRerank

    model_dir = _require_local(name, "reranker model")
    if use_st:
        return SentenceTransformerRerank(top_n=top_n, model=model_dir)
    if "bge-reranker-v2-minicpm-layerwise" in name:
        import dataclasses

        import jax

        from .hf_loader import load_minicpm_reranker
        from .minicpm import MiniCPMLayerWiseReranker

        cfg, params, start_layer = load_minicpm_reranker(model_dir, quant=quant)
        # tuned 512-block flash attention (head_dim 64) — ~1.9x per layer
        if jax.default_backend() != "cpu" and cfg.hd % 64 == 0:
            cfg = dataclasses.replace(cfg, use_flash=True)
        scorer = MiniCPMLayerWiseReranker(
            cfg, params, _load_tokenizer(model_dir),
            start_layer=start_layer,
            # the reference's fixed cutoff (rerankers.py:162) clamped to the
            # checkpoint's depth so reduced/test checkpoints load too
            cutoff_layer=min(28, cfg.num_hidden_layers),
            use_efficient=use_efficient,
        )
        return LLMRerank(
            scorer, top_n=top_n, embed_bs=embed_bs, embed_type=embed_type,
            use_efficient=use_efficient, cascade_keep=cascade_keep,
            cascade_carry=cascade_carry,
        )
    if "bge-reranker-v2.5-gemma2-lightweight" in name:
        from .gemma import load_gemma_reranker

        scorer = load_gemma_reranker(model_dir, quant=quant)
        return LLMRerank(
            scorer, top_n=top_n, embed_bs=embed_bs, embed_type=embed_type,
            use_efficient=use_efficient if use_efficient == 3 else 0,
            cascade_keep=cascade_keep, cascade_carry=cascade_carry,
        )
    from .yes_logit import YesLogitScorer

    scorer = YesLogitScorer.from_pretrained(model_dir, quant=quant)
    # no cascade here: YesLogitScorer always runs the full stack (its
    # cutoff_layer is informational), so stage 1 would cost full depth
    return LLMRerank(
        scorer, top_n=top_n, embed_bs=embed_bs, embed_type=embed_type,
        use_efficient=0,
    )
