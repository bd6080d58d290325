"""Pipeline-facing rerankers.

``LLMRerank`` drives a pair-scoring model (MiniCPM layerwise / Gemma
token-compress / generic yes-logit) over the fused candidate list in batches
of ``embed_bs``, replicating ``src/easyrag/custom/rerankers.py:298-376``:

* pairs are ``(query, get_node_content(node, r_embed_type))``
* the first batch may run the early-exit *judge* protocol; with
  ``use_efficient=1`` the discovered layer is reused for remaining batches
  (``rerankers.py:311-314,343-345``); with ``use_efficient=2`` every batch
  judges independently
* the retrieval score is preserved in ``metadata["retrieval_score"]``
* final ordering: ``sorted(key=-score if score else 0)[:top_n]``
  (``rerankers.py:371-373``; note falsy scores sort as 0, replicated)

``SentenceTransformerRerank`` wraps a CrossEncoder (max_length 512,
``rerankers.py:12,15-99``) via sentence-transformers on the torch CPU path —
acceptable because the ST route (``use_reranker=1``) is not the reference's
competition configuration; the TPU-native route is ``LLMRerank``.
"""

from __future__ import annotations

from typing import List, Optional

from .corpus.views import get_node_content
from .schema import NodeWithScore, QueryBundle
from .utils.events import emit

#: smallest compiled tail-batch shape. Tail batches pad to the smallest
#: halving of ``embed_bs`` >= this that fits, instead of the full batch:
#: a 198-pair fused set at bs 32 runs 6x32 + 1x8 rather than 7x32 — ~10%
#: of the rerank compute back for two extra compile-cache entries.
TAIL_BUCKET_MIN = 8


def tail_bucket(n_real: int, bsz: int, min_bucket: int = TAIL_BUCKET_MIN) -> int:
    """Smallest halving of ``bsz`` (>= ``min_bucket``) holding ``n_real``."""
    b = bsz
    while b // 2 >= max(n_real, min_bucket):
        b //= 2
    return b


class LLMRerank:
    def __init__(
        self,
        scorer,
        top_n: int = 2,
        embed_bs: int = 64,
        embed_type: int = 0,
        use_efficient: int = 0,
        keep_retrieval_score: bool = True,
    ) -> None:
        self.scorer = scorer
        self.top_n = top_n
        self.embed_bs = embed_bs
        self.embed_type = embed_type
        self.use_efficient = use_efficient
        self.keep_retrieval_score = keep_retrieval_score

    def postprocess_nodes(
        self,
        nodes: List[NodeWithScore],
        query_bundle: Optional[QueryBundle] = None,
    ) -> List[NodeWithScore]:
        if query_bundle is None:
            raise ValueError("Missing query bundle in extra info.")
        if len(nodes) == 0:
            return []
        query = query_bundle.query_str
        n = len(nodes)
        bsz = self.embed_bs
        saved_cutoff = getattr(self.scorer, "cutoff_layer", None)
        if getattr(self.scorer, "coalesce", False) and self.use_efficient != 2:
            # coalescing scorer (serving): hand over un-chunked pair lists so
            # tails can fuse with other requests' pairs into full batches.
            # use_efficient=2 judges every batch -> nothing to coalesce.
            scores = self._score_coalesced(nodes, query)
            for node, score in zip(nodes, scores):
                if self.keep_retrieval_score:
                    node.node.metadata["retrieval_score"] = node.score
                node.score = float(score)
            if saved_cutoff is not None:
                self.scorer.cutoff_layer = saved_cutoff
            return sorted(nodes, key=lambda x: -x.score if x.score else 0)[
                : self.top_n
            ]
        for lo in range(0, n, bsz):
            cur = nodes[lo : lo + bsz]
            pairs = [
                (query, get_node_content(node.node, self.embed_type)) for node in cur
            ]
            n_real = len(pairs)
            judge = self.use_efficient != 0 and (
                lo == 0 or self.use_efficient == 2
            )
            # pad tail batches to a bounded compile bucket (duplicate last
            # pair, scores sliced off) so batches hit a small set of
            # compiled shapes. Judge batches stay unpadded: the early-exit
            # criterion softmaxes over the batch's scores and duplicates
            # would perturb it.
            if n_real < bsz and not judge:
                pairs = pairs + [pairs[-1]] * (tail_bucket(n_real, bsz) - n_real)
            emit(
                "reranking",
                {"batch": lo // bsz, "pairs": n_real, "judge": judge},
            )
            scores, layer_used = self.scorer.score_pairs(pairs, judge=judge)
            scores = scores[:n_real]
            if lo == 0 and self.use_efficient == 1:
                # reuse the discovered exit layer for the remaining batches
                self.scorer.cutoff_layer = layer_used
            for node, score in zip(cur, scores):
                if self.keep_retrieval_score:
                    node.node.metadata["retrieval_score"] = node.score
                node.score = float(score)
        if saved_cutoff is not None:
            self.scorer.cutoff_layer = saved_cutoff  # don't leak across queries
        new_nodes = sorted(nodes, key=lambda x: -x.score if x.score else 0)[
            : self.top_n
        ]
        return new_nodes

    def _score_coalesced(self, nodes: List[NodeWithScore], query: str):
        """Score through a coalescing scorer: judge protocol (if any) on the
        first ``embed_bs`` pairs exactly as the legacy loop, then ALL
        remaining pairs in one call — the scorer chunks/pads them, fusing
        with concurrent requests."""
        pairs = [
            (query, get_node_content(node.node, self.embed_type)) for node in nodes
        ]
        out: List[float] = []
        start = 0
        if self.use_efficient == 1:
            first = pairs[: self.embed_bs]
            emit("reranking", {"batch": 0, "pairs": len(first), "judge": True})
            scores, layer_used = self.scorer.score_pairs(first, judge=True)
            self.scorer.cutoff_layer = layer_used
            out.extend(float(s) for s in scores[: len(first)])
            start = len(first)
        rest = pairs[start:]
        if rest:
            emit(
                "reranking",
                {"batch": 1 if start else 0, "pairs": len(rest), "judge": False},
            )
            scores, _ = self.scorer.score_pairs(rest, judge=False)
            out.extend(float(s) for s in scores[: len(rest)])
        return out


class SentenceTransformerRerank:
    """CrossEncoder rerank (``use_reranker=1``)."""

    def __init__(
        self,
        top_n: int = 2,
        model: str = "cross-encoder/stsb-distilroberta-base",
        keep_retrieval_score: bool = False,
        max_length: int = 512,
    ) -> None:
        from sentence_transformers import CrossEncoder

        self._model = CrossEncoder(model, max_length=max_length, trust_remote_code=True)
        self.top_n = top_n
        self.keep_retrieval_score = keep_retrieval_score

    def postprocess_nodes(
        self,
        nodes: List[NodeWithScore],
        query_bundle: Optional[QueryBundle] = None,
    ) -> List[NodeWithScore]:
        if query_bundle is None:
            raise ValueError("Missing query bundle in extra info.")
        if len(nodes) == 0:
            return []
        pairs = [(query_bundle.query_str, node.node.get_content()) for node in nodes]
        scores = self._model.predict(pairs)
        assert len(scores) == len(nodes)
        for node, score in zip(nodes, scores):
            if self.keep_retrieval_score:
                node.node.metadata["retrieval_score"] = node.score
            node.score = float(score)
        return sorted(nodes, key=lambda x: -x.score if x.score else 0)[: self.top_n]
