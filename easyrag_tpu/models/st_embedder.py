"""SentenceTransformer-backed embedder (compatibility path).

The reference selects this when the embedding name lacks "gte"/"Zhihui"
(``src/easyrag/pipeline/pipeline.py:109-115``,
``src/easyrag/custom/embeddings/hf_embeddings.py``). The TPU-native flagship
path is ``GTEEmbedder``; this wrapper keeps the secondary model family
available via torch-CPU sentence-transformers.
"""

from __future__ import annotations

from typing import List

import numpy as np


class STEmbedder:
    def __init__(self, model, embed_type: int = 0) -> None:
        self.model = model
        self.embed_type = embed_type

    @classmethod
    def from_pretrained(cls, model_dir: str, embed_type: int = 0) -> "STEmbedder":
        from sentence_transformers import SentenceTransformer

        return cls(SentenceTransformer(model_dir, trust_remote_code=True), embed_type)

    def get_query_embedding(self, query: str) -> np.ndarray:
        return self.model.encode([query], normalize_embeddings=True)[0]

    def get_text_embedding(self, text: str) -> np.ndarray:
        return self.model.encode([text], normalize_embeddings=True)[0]

    def get_text_embeddings(self, texts: List[str]) -> np.ndarray:
        return self.model.encode(list(texts), normalize_embeddings=True)

    def embed_nodes(self, nodes, embed_type=None) -> np.ndarray:
        from ..corpus.views import get_node_content

        et = self.embed_type if embed_type is None else embed_type
        return self.get_text_embeddings([get_node_content(n, et) for n in nodes])
