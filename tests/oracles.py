"""Clean-room scoring oracles used by parity tests.

Straightforward, loop-based implementations of the published algorithms the
reference relies on (rank_bm25's BM25Okapi and bm25s's "lucene" method),
written directly from the algorithm definitions. They exist so the packed
TPU index can be tested for *exact* score parity without the third-party
libraries (not installed here).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence


class OkapiOracle:
    """rank_bm25.BM25Okapi semantics: k1/b plus the epsilon IDF floor
    (negative IDFs replaced by ``epsilon * mean(idf)``)."""

    def __init__(self, corpus: Sequence[Sequence[str]], k1=1.5, b=0.75, epsilon=0.25):
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.corpus_size = len(corpus)
        self.doc_freqs: List[Dict[str, int]] = []
        self.doc_len: List[int] = []
        nd: Dict[str, int] = {}
        total = 0
        for doc in corpus:
            self.doc_len.append(len(doc))
            total += len(doc)
            freqs: Dict[str, int] = {}
            for tok in doc:
                freqs[tok] = freqs.get(tok, 0) + 1
            self.doc_freqs.append(freqs)
            for tok in freqs:
                nd[tok] = nd.get(tok, 0) + 1
        self.avgdl = total / self.corpus_size if self.corpus_size else 0.0
        # IDF with epsilon floor
        self.idf: Dict[str, float] = {}
        idf_sum = 0.0
        negative: List[str] = []
        for tok, df in nd.items():
            idf = math.log(self.corpus_size - df + 0.5) - math.log(df + 0.5)
            self.idf[tok] = idf
            idf_sum += idf
            if idf < 0:
                negative.append(tok)
        avg_idf = idf_sum / len(self.idf) if self.idf else 0.0
        for tok in negative:
            self.idf[tok] = self.epsilon * avg_idf

    def get_scores(self, query: Sequence[str]) -> List[float]:
        scores = [0.0] * self.corpus_size
        for tok in query:
            idf = self.idf.get(tok)
            if idf is None:
                continue
            for d in range(self.corpus_size):
                tf = self.doc_freqs[d].get(tok, 0)
                denom = tf + self.k1 * (
                    1 - self.b + self.b * self.doc_len[d] / self.avgdl
                )
                scores[d] += idf * (tf * (self.k1 + 1)) / denom
        return scores


class LuceneOracle:
    """bm25s default method="lucene": idf = ln(1 + (N-df+0.5)/(df+0.5)),
    score = idf * tf / (tf + k1*(1-b+b*dl/avgdl))."""

    def __init__(self, corpus: Sequence[Sequence[str]], k1=1.5, b=0.75):
        self.k1, self.b = k1, b
        self.corpus_size = len(corpus)
        self.doc_freqs: List[Dict[str, int]] = []
        self.doc_len: List[int] = []
        nd: Dict[str, int] = {}
        total = 0
        for doc in corpus:
            self.doc_len.append(len(doc))
            total += len(doc)
            freqs: Dict[str, int] = {}
            for tok in doc:
                freqs[tok] = freqs.get(tok, 0) + 1
            self.doc_freqs.append(freqs)
            for tok in freqs:
                nd[tok] = nd.get(tok, 0) + 1
        self.avgdl = total / self.corpus_size if self.corpus_size else 0.0
        self.idf = {
            tok: math.log(1.0 + (self.corpus_size - df + 0.5) / (df + 0.5))
            for tok, df in nd.items()
        }

    def get_scores(self, query: Sequence[str]) -> List[float]:
        scores = [0.0] * self.corpus_size
        for tok in query:
            idf = self.idf.get(tok)
            if idf is None:
                continue
            for d in range(self.corpus_size):
                tf = self.doc_freqs[d].get(tok, 0)
                denom = tf + self.k1 * (
                    1 - self.b + self.b * self.doc_len[d] / self.avgdl
                )
                scores[d] += idf * tf / denom
        return scores


def synthetic_corpus(num_docs=64, vocab=200, seed=0, min_len=5, max_len=60):
    """Deterministic random token corpus for parity tests."""
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    corpus = []
    for _ in range(num_docs):
        n = rng.randint(min_len, max_len)
        corpus.append([words[rng.randrange(vocab)] for _ in range(n)])
    return corpus
