"""Multi-host (DCN) index build.

SURVEY.md §5: ICI carries the query path; DCN (or a shared filesystem) is
only involved in *building* the index when the corpus outgrows one host.

Design — shard artifacts, then assemble:

1. every host parses + embeds its round-robin shard of the documents
   (:func:`build_shard`) and writes a shard artifact
   (``nodes.jsonl`` + ``emb.npy``) to a shared directory;
2. one host (or a later boot) assembles the shards in process order into
   the regular corpus state (:func:`assemble_shards`) — global node order
   is defined as process-concatenation order, and the sparse index is
   built over the assembled nodes (BM25 IDF is corpus-global, so postings
   cannot be finalized per shard).

``jax.distributed`` initialization is provided for the collective-runtime
case; the artifact path needs no network at all and is the default. The
whole flow degenerates to a single shard locally, which is how it is
tested (several "hosts" simulated sequentially).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..index.artifact import load_nodes, save_nodes
from ..schema import TextNode


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process).

    On the CPU platform the cross-process collective backend must be
    selected before the backend initializes; gloo is the one jaxlib ships.
    TPU pods need no selection (collectives ride ICI/DCN natively).
    """
    import jax

    if num_processes is None or num_processes <= 1:
        return
    # gloo only configures the CPU backend's cross-process collectives, so
    # select it whenever the CPU platform may be in play: explicitly chosen,
    # listed among several, or unset (auto-resolution may land on cpu —
    # checking jax.default_backend() here would initialize the backend,
    # which must not happen before jax.distributed.initialize)
    platforms = jax.config.jax_platforms or ""
    if platforms == "" or "cpu" in platforms.split(","):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_documents(documents: Sequence, process_id: int, num_processes: int) -> List:
    """Deterministic round-robin document partition (order-stable)."""
    return [doc for i, doc in enumerate(documents) if i % num_processes == process_id]


def build_shard(
    documents: Sequence,
    process_id: int,
    num_processes: int,
    parse_fn: Callable[[Sequence], List[TextNode]],
    out_dir: str,
    embed_fn: Optional[Callable[[List[TextNode]], np.ndarray]] = None,
) -> List[TextNode]:
    """Parse (and optionally embed) this host's document shard and persist
    it as ``<out_dir>/shard_<pid>``. Returns the shard's nodes."""
    local_docs = shard_documents(documents, process_id, num_processes)
    nodes = parse_fn(local_docs)
    shard_dir = os.path.join(out_dir, f"shard_{process_id:05d}")
    os.makedirs(shard_dir, exist_ok=True)
    save_nodes(nodes, os.path.join(shard_dir, "nodes.jsonl"))
    if embed_fn is not None:
        np.save(
            os.path.join(shard_dir, "emb.npy"),
            np.asarray(embed_fn(nodes), dtype=np.float32),
        )
    return nodes


def allgather_shard_embeddings(local_emb: np.ndarray) -> np.ndarray:
    """DCN-collective alternative to the shared-filesystem artifact path:
    every host contributes its shard's embeddings and receives the full
    matrix in process-concatenation order (the same global order
    :func:`assemble_shards` defines). Hosts must call collectively.

    Shard sizes differ (chunking is content-dependent), so counts are
    exchanged first and shards are padded to the max before the gather.
    Degenerates to identity in single-process runs.
    """
    import jax
    from jax.experimental import multihost_utils

    pcount = jax.process_count()
    if pcount == 1:
        return np.asarray(local_emb)
    local_emb = np.asarray(local_emb, dtype=np.float32)
    counts = multihost_utils.process_allgather(
        np.asarray([len(local_emb)], dtype=np.int64)
    ).reshape(-1)
    max_rows = int(counts.max())
    padded = np.zeros((max_rows, local_emb.shape[1]), dtype=np.float32)
    padded[: len(local_emb)] = local_emb
    gathered = multihost_utils.process_allgather(padded)  # [P, max_rows, D]
    return np.concatenate(
        [gathered[p][: int(counts[p])] for p in range(pcount)]
    )


def assemble_shards(
    out_dir: str,
) -> Tuple[List[TextNode], Optional[np.ndarray]]:
    """Merge all shard artifacts (process order) into the global node list
    and, when present, the full embedding matrix aligned with it."""
    shard_dirs = sorted(
        d for d in os.listdir(out_dir) if d.startswith("shard_")
    )
    if not shard_dirs:
        raise FileNotFoundError(f"no shard_* dirs under {out_dir}")
    nodes: List[TextNode] = []
    embs: List[np.ndarray] = []
    have_emb = True
    for d in shard_dirs:
        shard = os.path.join(out_dir, d)
        shard_nodes = load_nodes(os.path.join(shard, "nodes.jsonl"))
        nodes.extend(shard_nodes)
        emb_path = os.path.join(shard, "emb.npy")
        if os.path.exists(emb_path):
            emb = np.load(emb_path)
            if len(emb) != len(shard_nodes):
                raise ValueError(f"{d}: {len(emb)} embeddings vs {len(shard_nodes)} nodes")
            embs.append(emb)
        else:
            have_emb = False
    full = np.concatenate(embs) if (have_emb and embs) else None
    return nodes, full
