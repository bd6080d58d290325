"""ctypes bindings for the native index builder (native/bm25_index.cpp).

The shared library is built on demand with g++ (cached next to the source);
absence of a toolchain degrades to the pure-Python builder in
``index/sparse.py`` — results are identical (tested), native is the fast
path for large corpora.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "bm25_index.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libeasyrag_bm25.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_lib() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
        return _LIB
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build_lib()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.easyrag_build_bm25_index.restype = ctypes.c_int64
        lib.easyrag_build_bm25_index.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,  # text_buf, buf_len
            ctypes.c_int64,  # n_tokens
            i64p, ctypes.c_int64,  # doc_offsets, n_docs
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),  # token_term_ids
            ctypes.POINTER(ctypes.c_int32),  # doc_lens
            i64p,  # term_offsets
            ctypes.POINTER(ctypes.c_int32),  # post_docs
            ctypes.POINTER(ctypes.c_int32),  # post_tfs
            ctypes.POINTER(ctypes.c_double),  # post_vals
            i64p, i64p,  # out_vocab, out_postings
            i64p,  # first_token_pos
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def build_index_native(
    corpus_tokens: Sequence[Sequence[str]],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
    bm25_type: int = 0,
):
    """Tokenized corpus -> packed arrays via the C++ builder.

    Returns (vocab_dict, doc_lens, term_offsets, post_docs, post_tfs,
    post_vals) with identical semantics to the Python builder, or None when
    the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None

    flat: List[str] = []
    doc_offsets = np.zeros(len(corpus_tokens) + 1, dtype=np.int64)
    for d, toks in enumerate(corpus_tokens):
        flat.extend(toks)
        doc_offsets[d + 1] = len(flat)
    n_tokens = len(flat)
    # one join+encode: C++ splits on the NUL separators (tokens cannot
    # contain NUL; jieba never emits it)
    text_buf = "\x00".join(flat).encode("utf-8")

    token_term_ids = np.zeros(max(n_tokens, 1), dtype=np.int32)
    doc_lens = np.zeros(max(len(corpus_tokens), 1), dtype=np.int32)
    term_offsets = np.zeros(n_tokens + 1, dtype=np.int64)
    post_docs = np.zeros(max(n_tokens, 1), dtype=np.int32)
    post_tfs = np.zeros(max(n_tokens, 1), dtype=np.int32)
    post_vals = np.zeros(max(n_tokens, 1), dtype=np.float64)
    first_token_pos = np.zeros(max(n_tokens, 1), dtype=np.int64)
    out_v = ctypes.c_int64(0)
    out_p = ctypes.c_int64(0)

    ret = lib.easyrag_build_bm25_index(
        text_buf,
        len(text_buf),
        n_tokens,
        doc_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(corpus_tokens),
        k1, b, epsilon, bm25_type,
        token_term_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        doc_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        term_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        post_docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        post_tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        post_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(out_v),
        ctypes.byref(out_p),
        first_token_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if ret != 0:
        return None
    V, P = out_v.value, out_p.value

    # term ids are assigned in first-appearance order; the C++ side records
    # the first token position of each id
    vocab = {flat[int(first_token_pos[v])]: v for v in range(V)}

    return (
        vocab,
        doc_lens[: len(corpus_tokens)],
        term_offsets[: V + 1].copy(),
        post_docs[:P].copy(),
        post_tfs[:P].copy(),
        post_vals[:P].copy(),
    )
