"""GTE-Qwen2 embedding model (JAX).

Replaces the vendored torch ``Qwen2Model`` embedder
(``src/easyrag/utils/modeling_qwen.py`` +
``src/easyrag/custom/embeddings/gte_embeddings.py``): last-token pooling
(``gte_embeddings.py:42-50``), "Instruct: ... \\nQuery: " query prefix
(:52-53), max_length 8192 (:62), L2 normalization (:70), bf16 weights.

TPU-first batching: inputs are padded to (batch, seq) *buckets* so each
shape compiles once; the whole embed step (forward + pooling + normalize)
is a single jit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .layers import DecoderConfig, forward_hidden

QUERY_INSTRUCT = (
    "Instruct: Given a web search query, retrieve relevant passages that "
    "answer the query\nQuery: "
)

SEQ_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


def qwen2_config_from_hf(hf: Dict[str, Any], dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        attention_bias=True,  # Qwen2 uses QKV bias
        dtype=dtype,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "left_padded"))
def embed_step(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    left_padded: bool = False,
) -> jnp.ndarray:
    """forward -> last-token pool -> L2 normalize; returns [B, D] f32."""
    h = forward_hidden(cfg, params, input_ids, attention_mask)
    if left_padded:
        pooled = h[:, -1]
    else:
        lengths = jnp.sum(attention_mask, axis=1) - 1
        pooled = jnp.take_along_axis(h, lengths[:, None, None], axis=1)[:, 0]
    pooled = pooled.astype(jnp.float32)
    norms = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norms, 1e-12)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class GTEEmbedder:
    """Query/text embedder with the GTE contract."""

    def __init__(
        self,
        cfg: DecoderConfig,
        params: Dict[str, Any],
        tokenizer,
        max_length: int = 8192,
        embed_batch_size: int = 128,
        embed_type: int = 0,
        batch_buckets: Sequence[int] = (1, 8, 32, 128),
    ) -> None:
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.embed_batch_size = embed_batch_size
        self.embed_type = embed_type
        self.batch_buckets = tuple(b for b in batch_buckets if b <= embed_batch_size) or (
            embed_batch_size,
        )

    # -- core ---------------------------------------------------------------

    def _embed(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.cfg.hidden_size), dtype=np.float32)
        bs = self.embed_batch_size
        for lo in range(0, len(texts), bs):
            chunk = texts[lo : lo + bs]
            enc = self.tokenizer(
                chunk,
                max_length=self.max_length,
                padding=True,
                truncation=True,
                return_tensors="np",
            )
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.int32)
            b, s = ids.shape
            sb = _bucket(s, [x for x in SEQ_BUCKETS if x <= self.max_length] or [self.max_length])
            bb = _bucket(b, self.batch_buckets)
            ids_p = np.zeros((bb, sb), dtype=np.int32)
            mask_p = np.zeros((bb, sb), dtype=np.int32)
            ids_p[:b, :s] = ids
            mask_p[:b, :s] = mask
            # padding rows need >=1 real token for the length-1 gather
            mask_p[b:, 0] = 1
            emb = embed_step(self.cfg, self.params, jnp.asarray(ids_p), jnp.asarray(mask_p))
            out[lo : lo + b] = np.asarray(emb)[:b]
        return out

    # -- GTE public contract --------------------------------------------------

    def get_detailed_instruct(self, query: str) -> str:
        return f"{QUERY_INSTRUCT}{query}"

    def get_query_embedding(self, query: str) -> np.ndarray:
        return self._embed([self.get_detailed_instruct(query)])[0]

    def get_query_embeddings(self, queries: List[str]) -> np.ndarray:
        """Batched query embedding (one device stream for a whole eval set)."""
        return self._embed([self.get_detailed_instruct(q) for q in queries])

    def get_text_embedding(self, text: str) -> np.ndarray:
        return self._embed([text])[0]

    def get_text_embeddings(self, texts: List[str]) -> np.ndarray:
        return self._embed(list(texts))

    def embed_nodes(self, nodes, embed_type: Optional[int] = None) -> np.ndarray:
        from ..corpus.views import get_node_content

        et = self.embed_type if embed_type is None else embed_type
        return self._embed([get_node_content(n, et) for n in nodes])
