"""Splitter token-counter selection and offline determinism.

The counter decides chunk boundaries (PARITY deviation #2, reference counter
= tiktoken cl100k via ``llama_index.core.utils.get_tokenizer``). These tests
pin the selection machinery: the vendored-table hook loads a standard
``.tiktoken`` rank file with no network, the selection is queryable/logged,
and chunk boundaries under the pinned offline counter are golden — identical
with and without network.
"""

import base64

import pytest

from easyrag_tpu.corpus import tokenizer as tk
from easyrag_tpu.corpus.splitter import SentenceSplitter


@pytest.fixture(autouse=True)
def _fresh_selection():
    tk.reset_token_counter()
    yield
    tk.reset_token_counter()


def _write_byte_level_table(path):
    """A complete byte-level BPE table (all 256 single bytes, no merges) in
    the standard ``cl100k_base.tiktoken`` format. Valid for any input text:
    every piece tokenizes to its raw bytes, so count(text) == len(utf-8)."""
    lines = [
        base64.b64encode(bytes([b])).decode() + f" {b}" for b in range(256)
    ]
    path.write_text("\n".join(lines), encoding="utf-8")


def test_vendored_table_hook(tmp_path, monkeypatch):
    table = tmp_path / "cl100k_base.tiktoken"
    _write_byte_level_table(table)
    monkeypatch.setenv("EASYRAG_CL100K_PATH", str(table))
    counter = tk.default_token_counter()
    assert tk.token_counter_info() == "tiktoken-vendored"
    for text in ["hello world", "扩容的最大个数", "a\n\nb  c", ""]:
        assert counter(text) == len(text.encode("utf-8"))
    # special tokens are counted, not rejected (allowed_special="all")
    assert counter("<|endoftext|>") == 1


def test_corrupt_vendored_table_falls_through(tmp_path, monkeypatch, caplog):
    table = tmp_path / "bad.tiktoken"
    table.write_text("not a rank table", encoding="utf-8")
    monkeypatch.setenv("EASYRAG_CL100K_PATH", str(table))
    counter = tk.default_token_counter()
    # no network + no cache in this image -> approx fallback
    assert tk.token_counter_info() in ("approx", "tiktoken")
    assert counter("扩容abc") >= 1


def test_selection_is_cached_and_resettable(tmp_path, monkeypatch):
    monkeypatch.setenv("EASYRAG_CL100K_PATH", str(tmp_path / "absent"))
    c1 = tk.default_token_counter()
    name1 = tk.token_counter_info()
    assert tk.default_token_counter() is c1
    table = tmp_path / "t.tiktoken"
    _write_byte_level_table(table)
    monkeypatch.setenv("EASYRAG_CL100K_PATH", str(table))
    # still cached until reset
    assert tk.default_token_counter() is c1 and tk.token_counter_info() == name1
    tk.reset_token_counter()
    assert tk.token_counter_info() == "unselected"
    tk.default_token_counter()
    assert tk.token_counter_info() == "tiktoken-vendored"


def test_chunk_boundaries_golden_offline():
    """Boundary golden under the pinned offline approximation: stable across
    machines, network states, and tiktoken cache states."""
    sp = SentenceSplitter(
        chunk_size=24, chunk_overlap=6, token_counter=tk.approx_token_count
    )
    text = (
        "系统支持全量备份。增量备份每天执行一次。"
        "CDU虚机每次扩容的最大SC个数为15。"
        "鉴权失败时需要检查LDAP连接。"
        "\n\n\n"
        "日志保留周期默认为30天，可在配置文件中修改。"
    )
    chunks = sp.split_text(text)
    assert chunks == [
        "系统支持全量备份。增量备份每天执行一次。",
        "CDU虚机每次扩容的最大SC个数为15。",
        "鉴权失败时需要检查LDAP连接。",
        "日志保留周期默认为30天，可在配置文件中修改。",
    ]
    # approx counts underpinning the boundaries are themselves golden
    assert [tk.approx_token_count(c) for c in chunks] == [20, 16, 13, 22]
