"""Chinese tokenization for the sparse route, plus splitter token counters.

Query/corpus tokenization must be *bit-compatible* with the reference or
BM25 recall parity fails: jieba default-mode cut with a dedicated
``jieba.Tokenizer()`` instance (``src/easyrag/pipeline/pipeline.py:177-178``),
then removal of HIT stopwords and the single-space token
(``src/easyrag/custom/retrievers.py:72-76``).

The splitter additionally needs a *token counter* to measure chunk sizes.
llama-index defaults to tiktoken's gpt-3.5-turbo encoding
(``llama_index.core.utils.get_tokenizer``); tiktoken needs network access to
fetch its BPE table, so we use it when importable+cached and otherwise fall
back to a deterministic CJK-aware approximation (1 token per CJK char,
ASCII word-pieces of ~4 chars). The fallback changes chunk boundaries
relative to the reference — acceptable because chunking feeds both systems
identically when comparing retrieval parity on the same chunk set, and the
counter is pluggable for exact reproduction.
"""

from __future__ import annotations

import json
import os
import re
import threading
from typing import Callable, Iterable, List, Set

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")


def load_stopwords(path: str) -> Set[str]:
    """Load a stopword file, one word per line, stripped
    (``pipeline.py:28-31``)."""
    with open(path, "r", encoding="utf-8") as f:
        return {line.strip() for line in f}


def default_stopwords() -> Set[str]:
    """The packaged HIT Chinese stopword list (767 entries)."""
    with open(os.path.join(_DATA_DIR, "stopwords_hit.json"), encoding="utf-8") as f:
        obj = json.load(f)
    return set(obj["words"])


class JiebaTokenizer:
    """Thread-safe wrapper over a dedicated ``jieba.Tokenizer`` instance.

    Default mode (HMM on, not cut_all), matching ``jieba.Tokenizer().cut``
    as used by the reference sparse retriever.
    """

    def __init__(self) -> None:
        import jieba

        self._tk = jieba.Tokenizer()
        self._lock = threading.Lock()

    def cut(self, text: str) -> List[str]:
        with self._lock:
            return list(self._tk.cut(text))

    def __call__(self, text: str) -> List[str]:
        return self.cut(text)


def tokenize_and_remove_stopwords(
    tokenizer, text: str, stopwords: Iterable[str]
) -> List[str]:
    """jieba cut + stopword and single-space removal
    (``retrievers.py:72-76``). Note: only the exact token ``" "`` is
    removed; multi-space tokens pass through, as in the reference."""
    words = tokenizer.cut(text)
    return [w for w in words if w not in stopwords and w != " "]


# ---------------------------------------------------------------------------
# Token counters for the splitter
# ---------------------------------------------------------------------------

_CJK_RE = re.compile(
    "[一-鿿㐀-䶿豈-﫿　-〿＀-￯]"
)
_ASCII_WORD_RE = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")


def approx_token_count(text: str) -> int:
    """Deterministic offline approximation of a BPE token count.

    CJK chars count 1 each; ASCII words count ceil(len/4); other punctuation
    counts 1. Whitespace is free. Stable across platforms and needs no
    downloaded vocabulary.
    """
    n = len(_CJK_RE.findall(text))
    ascii_part = _CJK_RE.sub(" ", text)
    for m in _ASCII_WORD_RE.findall(ascii_part):
        n += max(1, -(-len(m) // 4))
    return n


_tiktoken_counter = None
_tiktoken_checked = False


def default_token_counter() -> Callable[[str], int]:
    """tiktoken cl100k (llama-index's default) when usable offline, else
    :func:`approx_token_count`."""
    global _tiktoken_counter, _tiktoken_checked
    if not _tiktoken_checked:
        _tiktoken_checked = True
        try:  # pragma: no cover - depends on local tiktoken cache
            import tiktoken

            enc = tiktoken.get_encoding("cl100k_base")
            enc.encode("warmup")
            _tiktoken_counter = lambda s: len(enc.encode(s, allowed_special="all"))
        except Exception:
            _tiktoken_counter = None
    return _tiktoken_counter or approx_token_count
