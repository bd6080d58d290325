"""Typed configuration with the reference's full knob surface.

The reference reads a single YAML into an untyped dict
(``src/easyrag/utils/__init__.py:4-9``) keyed throughout
``src/easyrag/pipeline/pipeline.py``. Here the same knobs (same names, same
integer encodings, same defaults as ``src/configs/easyrag.yaml``) become a
validated dataclass, plus a ``tpu`` section for mesh/sharding/precision
choices that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class TPUConfig:
    """TPU-native execution knobs (new; no reference equivalent)."""

    mesh_shape: Optional[List[int]] = None  # None -> all devices on one axis
    mesh_axis_names: List[str] = field(default_factory=lambda: ["data"])
    # dense index + score dtypes
    index_dtype: str = "bfloat16"
    accum_dtype: str = "float32"
    # use Pallas kernels where available (else pure-XLA fallbacks)
    use_pallas: bool = True
    # persistent XLA executable cache directory ("" = off). On a
    # remote-attached TPU every 7B-scale graph compile costs minutes to
    # tens of minutes and is NOT cached across processes; with this set,
    # reboots load the serialized executables from disk instead
    # (utils/compile_cache.py — verified through the axon tunnel)
    compile_cache_dir: str = ""
    # max tokenized query terms / gathered postings per query (static shapes)
    max_query_terms: int = 64
    max_query_postings: int = 32768
    # query microbatch for batched retrieval
    query_batch: int = 32
    # embedder weight storage: "" keeps bf16; "int8" stores the matmul
    # weights int8 with per-channel scales (4x f32 / 2x bf16 HBM headroom —
    # the 7B-embedder-next-to-a-large-index case, SURVEY §7 hard part #4);
    # "w8a8" additionally quantizes activations per-token at run time so
    # the s8 x s8 contraction runs at the MXU's 2x int8 rate (small
    # rounding error — opt-in, see layers._linear); "int4"/"w4a8" store
    # nibble-packed weights at half int8's HBM (~3.8 GiB at 7B incl. the
    # int8 embed table) — the four-tenant co-residency configuration
    # (embedder + reranker + generator + indexes on one 16 GB chip)
    embedder_quant: str = ""
    # reranker quantization: "" (bf16) | "int8" | "w8a8" | "int4" | "w4a8"
    # (same contract)
    reranker_quant: str = ""
    # survivors re-scored at full depth when r_use_efficient=3 (cascade):
    # stage 1 scores every pair at the judge layer, stage 2 only the top
    # cascade_keep — must be >= r_topk; larger values trade speed for a
    # smaller chance the judge layer hides a true top-r_topk pair
    cascade_keep: int = 32
    # cascade stage 2 resumes from the carried stage-1 hidden states
    # instead of re-running layers [0, judge) — saves keep x judge
    # layer-batches per query for ~1.2 GB of transient HBM at the
    # production shape (off by default: the fully co-resident bf16 config
    # sits near the 16 GB ceiling)
    cascade_carry: bool = False
    # resident sparse heavy-matrix storage: float32 (exact, default) |
    # bfloat16 (2x HBM headroom) | int8 (4x, per-doc-column scales)
    sparse_heavy_dtype: str = "float32"
    # HBM budget for the heavy matrix; smaller budgets raise the auto
    # light_cap (more gather work), larger ones lower it (more MXU work)
    sparse_heavy_hbm_budget: int = 512 * 1024 * 1024
    # HBM budget for the padded term-major light-postings tables ((V+1)*C*8
    # bytes per index); tables over budget fall back to the CSR layout
    sparse_light_rows_hbm_budget: int = 256 * 1024 * 1024
    # backend for cfg.local_llm_name: "jax" runs the TPU-native
    # prefill+KV-cache greedy decoder (models/decode.py) from a safetensors
    # checkpoint dir; "hf" keeps the torch parity wrapper
    # (generation.LocalHFLLM, reference llm_utils.py:58-73 semantics)
    local_llm_backend: str = "jax"
    # weight storage for the jax local LLM:
    # "" | "int8" | "w8a8" | "int4" | "w4a8"
    # (int4: nibble-packed per-channel weights — half int8's HBM AND the
    # fastest decode: the Pallas in-VMEM unpack matvec reads only packed
    # bytes, measured 6.2 vs int8's 9.9 ms/step at 7B. The knob that lets
    # the generator co-reside with the embedder + reranker + indexes on
    # one 16 GB chip. ~16x coarser rounding than int8; real-weight answer
    # parity is environment-blocked. w4a8 = int4 storage + w8a8's dynamic
    # activation quant on prefill shapes: 2x MXU prefill, same kernel
    # decode — the fastest end-to-end generation config)
    local_llm_quant: str = "int8"
    # use the local decoder as the ANSWER LLM (pipeline.llm) instead of the
    # GLM-4 network client — the complete zero-network RAG deployment.
    # Concurrent requests batch into shared decode dispatches
    # (generation.BatchingLocalLLM; decode is weight-bandwidth-bound, so
    # batched rows are nearly free — +4% step cost at B=8, BASELINE.md)
    local_llm_answer: bool = False
    # cap on generated tokens per answer (0 -> the reference's
    # max_length=8192 semantics: generate until EOS or the length cap)
    local_llm_max_new: int = 0
    # max rows per batched generation dispatch; KV cache costs ~56 KB per
    # (row, token slot) at 7B scale, so 8 rows at the 7680 bucket is
    # ~3.5 GB of transient HBM
    local_llm_gen_batch: int = 8
    # continuous batching (models/decode_pool.py): requests JOIN a running
    # decode at chunk boundaries instead of fusing only when they arrive
    # within a window — the fix for staggered arrivals (BASELINE.md's
    # gen-batch-neutral-at-c=4 measurement). Pool size = gen_batch; needs
    # local_llm_max_new set (static per-row output buffer) and the jax
    # backend. The pool's KV state is persistent HBM:
    # gen_batch × (largest bucket + max_new) slots
    local_llm_continuous: bool = False
    # decode steps per pool dispatch: join granularity is chunk_steps ×
    # ~10 ms against one ~30 ms host round trip per chunk on a remote
    # attachment (32 → ~0.3 s joins at ~10% dispatch overhead). With
    # local_llm_spec set, chunks count verify blocks (1..spec+1 tokens each)
    local_llm_chunk_steps: int = 32
    # per-bucket pool slot tiers, "bucket:slots,bucket:slots" (e.g.
    # "2048:2,7680:2"): short prompts stop reserving largest-bucket KV —
    # at 7B/max_new=128 a 7808-slot row costs ~0.44 GB vs ~0.12 at 2176,
    # the difference between pool 4 fitting next to the full co-resident
    # stack or OOMing (ROADMAP r3 lesson). "" = one tier at the largest
    # bucket with gen_batch slots. Buckets must be prompt buckets
    local_llm_pool_tiers: str = ""
    # pre-compile the generation executables at boot (serving: kills the
    # tens-of-seconds cold-compile p99 spike on first-seen prompt buckets;
    # warms EVERY (bucket, batch-size) pair the server can hit — any cold
    # pair otherwise lands a tens-of-seconds compile on an unlucky request)
    local_llm_warmup: bool = False
    # prompt-lookup speculative decoding (models/decode.py::
    # generate_greedy_spec): each decode step verifies this many tokens
    # drafted from the sequence's own earlier n-gram continuations in ONE
    # forward — decode is weight-bandwidth-bound, so accepted drafts are
    # nearly free. Exact-greedy (bit-identical outputs); pays most for RAG
    # answers that copy spans from the retrieved context. 0 = off. Applies
    # to both the batched path (generate_greedy_spec) and the continuous
    # pool (pool_chunk_spec)
    local_llm_spec: int = 0
    # trailing n-gram length the draft lookup matches on
    local_llm_spec_ngram: int = 2
    # shard the retrieval indexes (sparse postings + dense matrix) over the
    # mesh "data" axis: per-shard scoring + local top-k + all-gather merge
    # (parallel/sharded.py). Requires mesh_shape with a "data" axis > 1;
    # results are identical to the single-chip indexes.
    shard_index: bool = False


@dataclass
class EasyRAGConfig:
    # -- pipeline modes (easyrag.yaml:1-3) --
    rerank_fusion_type: int = 0  # 0 none | 1 rrf of two routes | 2 longest | 3 concat
    ans_refine_type: int = 0  # 0 none | 1 LLM merge w/ top1 | 2 concat top1

    # -- coarse ranking (easyrag.yaml:5-11) --
    re_only: bool = False
    retrieval_type: int = 2  # 1 dense | 2 sparse | 3 hybrid
    f_topk: int = 256  # hybrid fusion topk
    f_topk_1: int = 288  # dense coarse topk
    f_topk_2: int = 192  # sparse coarse topk
    f_topk_3: int = 6  # know-path route topk (0 disables the route)

    # -- dense retriever (easyrag.yaml:13-18) --
    reindex: bool = False
    embedding_name: str = "Alibaba-NLP/gte-Qwen2-7B-instruct"
    vector_size: int = 3584
    cache_path: str = "cache"
    collection_name: str = "aiops24"

    # -- sparse retriever (easyrag.yaml:20-21) --
    bm25_type: int = 0  # 0 okapi (epsilon IDF floor) | 1 eager/robertson (bm25s)

    # -- reranker (easyrag.yaml:23-29) --
    r_topk: int = 6
    r_topk_1: int = 6
    reranker_name: str = "BAAI/bge-reranker-v2-minicpm-layerwise"
    use_reranker: int = 2  # 0 none | 1 cross-encoder | 2 layerwise LLM reranker
    r_embed_bs: int = 32
    # 0 off | 1 max-prob early exit | 2 entropy early exit |
    # 3 two-stage cascade (TPU extension, see rerankers.py + tpu.cascade_keep)
    r_use_efficient: int = 0

    # -- generation (easyrag.yaml:31-37) --
    llm_keys: List[str] = field(default_factory=list)
    llm_name: str = "glm-4"
    llm_api_base: str = "https://open.bigmodel.cn/api/paas/v4/"
    llm_embed_type: int = 3

    # -- content view encodings (easyrag.yaml:39-42) --
    f_embed_type_1: int = 1  # dense document view
    f_embed_type_2: int = 2  # sparse document view
    r_embed_type: int = 1  # rerank document view

    # -- chunking (easyrag.yaml:44-47) --
    split_type: int = 0  # 0 sentence | 1 hierarchical
    chunk_size: int = 1024
    chunk_overlap: int = 200

    # -- paths (easyrag.yaml:49-52) --
    data_path: str = "../data/format_data_with_img"
    hfmodel_cache_folder: str = ""
    stopwords_path: str = ""  # default: packaged HIT list
    index_artifact_path: str = ""  # on-disk index artifact (qdrant-collection analog)

    # -- local LLM (easyrag.yaml:54-55) --
    local_llm_name: str = ""

    # -- context compression (easyrag.yaml:57-59) --
    compress_method: str = ""  # "" | bm25_extract | llmlingua | longllmlingua
    compress_rate: float = 0.5

    # -- HyDE (easyrag.yaml:61-63) --
    hyde: bool = False
    hyde_merging: bool = False

    # -- serving batcher (new; the reference serves strictly per-request) --
    serve_window_ms: float = 4.0  # request-coalescing window
    serve_max_batch: int = 32  # max coalesced retrieval batch
    serve_coalesce_rerank: bool = True  # fuse reranker batches across requests

    # -- TPU execution --
    tpu: TPUConfig = field(default_factory=TPUConfig)

    def __post_init__(self) -> None:
        if self.chunk_overlap > self.chunk_size:
            raise ValueError(
                f"chunk_overlap ({self.chunk_overlap}) > chunk_size ({self.chunk_size})"
            )
        if self.retrieval_type not in (1, 2, 3):
            raise ValueError(f"retrieval_type must be 1|2|3, got {self.retrieval_type}")
        if self.use_reranker not in (0, 1, 2):
            raise ValueError(f"use_reranker must be 0|1|2, got {self.use_reranker}")
        if self.bm25_type not in (0, 1):
            raise ValueError(f"bm25_type must be 0|1, got {self.bm25_type}")

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "EasyRAGConfig":
        known = {f.name: f for f in dataclasses.fields(cls)}
        kwargs: Dict[str, Any] = {}
        extra: Dict[str, Any] = {}
        tpu_fields = {f.name for f in dataclasses.fields(TPUConfig)}
        for key, value in raw.items():
            if key == "tpu" and isinstance(value, dict):
                # unknown tpu.* knobs survive in extra (like fire's dict
                # merge at the top level) instead of a raw TypeError
                kwargs["tpu"] = TPUConfig(
                    **{k: v for k, v in value.items() if k in tpu_fields}
                )
                for k, v in value.items():
                    if k not in tpu_fields:
                        extra[f"tpu.{k}"] = v
            elif key in known:
                kwargs[key] = value
            else:
                extra[key] = value
        cfg = cls(**kwargs)
        # tolerate reference-yaml keys we intentionally don't model
        cfg.extra = extra  # type: ignore[attr-defined]
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def parse_pool_tiers(spec: str) -> Optional[List[tuple]]:
    """Parse ``tpu.local_llm_pool_tiers`` ("2048:2,7680:2") into
    ``[(bucket, slots), ...]``; "" -> None (single largest-bucket tier)."""
    if not spec:
        return None
    tiers = []
    for part in str(spec).split(","):
        bucket, _, slots = part.partition(":")
        try:
            tiers.append((int(bucket), int(slots)))
        except ValueError:
            raise ValueError(
                f"tpu.local_llm_pool_tiers expects 'bucket:slots,...', got {spec!r}"
            ) from None
    return tiers


def parse_override(spec: str) -> (str, Any):
    """Parse one ``key=value`` CLI override into a typed ``(key, value)``.

    This is the argparse stand-in for fire's arbitrary-kwargs merge
    (``src/main.py:21-32``): the reference accepts ANY ``--knob value`` and
    folds it into the raw config dict. Values are typed by YAML rules
    (``1`` -> int, ``0.4`` -> float, ``true`` -> bool, ``[1,2]`` -> list,
    anything else -> str). Dotted keys address the ``tpu`` section
    (``tpu.query_batch=16``).
    """
    if "=" not in spec:
        raise ValueError(f"--set expects key=value, got {spec!r}")
    key, _, text = spec.partition("=")
    key = key.strip()
    if not key:
        raise ValueError(f"--set expects key=value, got {spec!r}")
    try:
        value = yaml.safe_load(text) if text != "" else ""
    except yaml.YAMLError:
        value = text
    return key, value


def apply_overrides(raw: Dict[str, Any], overrides: Dict[str, Any]) -> None:
    """Merge typed overrides into the raw config dict in place.

    Dotted keys update nested sections (currently ``tpu.*``); plain keys
    replace top-level entries — exactly fire's ``config[key] = value``
    behavior in ``src/main.py:30-32``, unknown keys included (they survive
    in ``EasyRAGConfig.extra``).
    """
    for key, value in overrides.items():
        if "." in key:
            head, _, rest = key.partition(".")
            section = raw.get(head)
            if section is None:  # absent, or a bare `tpu:` line (YAML None)
                section = {}
                raw[head] = section
            if not isinstance(section, dict):
                raise ValueError(f"cannot set {key!r}: {head!r} is not a section")
            section[rest] = value
        else:
            raw[key] = value


def load_config(
    path: str,
    overrides: Optional[Dict[str, Any]] = None,
    set_specs: Optional[List[str]] = None,
) -> EasyRAGConfig:
    """YAML -> :class:`EasyRAGConfig`, CLI-override merge like ``main.py:30-32``.

    ``overrides`` are already-typed values from fixed CLI flags;
    ``set_specs`` are raw ``key=value`` strings from ``--set`` (fire-style
    arbitrary knobs), typed by :func:`parse_override`.
    """
    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    merged: Dict[str, Any] = {}
    if overrides:
        merged.update(overrides)
    for spec in set_specs or []:
        key, value = parse_override(spec)
        merged[key] = value
    apply_overrides(raw, merged)
    return EasyRAGConfig.from_dict(raw)
