"""get_node_content embed_type contract + merge_strings golden tests."""

from easyrag_tpu.corpus.views import get_node_content, merge_strings
from easyrag_tpu.schema import (
    NodeRelationship,
    NodeWithScore,
    TextNode,
    build_nodeid2idx,
)


def test_merge_strings_overlap():
    assert merge_strings("abcdef", "defghi") == "abcdefghi"
    assert merge_strings("abc", "xyz") == "abcxyz"
    assert merge_strings("", "xyz") == "xyz"
    assert merge_strings("abc", "") == "abc"
    assert merge_strings("aaa", "aaa") == "aaa"


def _node(text, **metadata):
    return TextNode(text=text, metadata=metadata)


def test_embed_type_0_raw():
    n = _node("body", file_path="f.txt")
    assert get_node_content(n, 0) == "body"


def test_embed_type_1_file_path_prefix():
    n = _node("body", file_path="dir/f.txt")
    assert get_node_content(n, 1) == "###\ndir/f.txt\n\nbody"
    assert get_node_content(_node("body"), 1) == "body"  # missing -> raw


def test_embed_type_2_know_path_prefix():
    n = _node("body", know_path="a/b/c")
    assert get_node_content(n, 2) == "###\na/b/c\n\nbody"


def test_embed_type_3_ocr_enrichment():
    n = _node(
        "see 图1 标题\nrest",
        imgobjs=[{"cap": "图1", "title": "标题", "content": "ocr text"}],
    )
    assert get_node_content(n, 3) == "see 图1.标题:ocr text\nrest"


def test_embed_type_4_5_path_only():
    n = _node("body", file_path="f.txt", know_path="k/p")
    assert get_node_content(n, 4) == "f.txt"
    assert get_node_content(n, 5) == "k/p"
    assert get_node_content(_node("body"), 4) == ""
    assert get_node_content(_node("body"), 5) == ""


def test_embed_type_6_header_recovery_direct_prev():
    # separator row starting with "---": the line before the first "---" is
    # the header row, so it is recovered intact
    header = "| a | b |\n--- | ---\n"
    body = "| 1 | 2 |\n| 3 | 4 |\n| 5 | 6 |\n"
    prev = TextNode(text=header)
    cur = TextNode(text=body)
    cur.relationships[NodeRelationship.PREVIOUS] = prev.node_id
    nodes = [prev, cur]
    idx = build_nodeid2idx(nodes)
    out = get_node_content(cur, 6, nodes=nodes, nodeid2idx=idx)
    assert out == "| a | b |--- | ---\n| 1 | 2 |\n| 3 | 4 |\n| 5 | 6 |\n"


def test_embed_type_6_piped_separator_keeps_partial_line():
    # separator row "| --- | --- |": the text before the first "---" ends in
    # a lone "|", so only that partial line survives — the reference's exact
    # arithmetic (``ingestion.py:52-54``), replicated
    header = "| a | b |\n| --- | --- |\n"
    body = "| 1 | 2 |\n| 3 | 4 |\n| 5 | 6 |\n"
    prev = TextNode(text=header)
    cur = TextNode(text=body)
    cur.relationships[NodeRelationship.PREVIOUS] = prev.node_id
    nodes = [prev, cur]
    idx = build_nodeid2idx(nodes)
    out = get_node_content(cur, 6, nodes=nodes, nodeid2idx=idx)
    assert out == "|--- | --- |\n| 1 | 2 |\n| 3 | 4 |\n| 5 | 6 |\n"


def test_embed_type_6_no_walk_beyond_direct_prev():
    """Parity with the reference quirk: the header is only recovered from the
    *direct* predecessor; two hops back is out of reach."""
    header = "| a | b |\n| --- | --- |\n"
    middle = "| x | y |\n| z | w |\n"  # has pipes but no separator
    body = "| 1 | 2 |\n| 3 | 4 |\n| 5 | 6 |\n"
    n0, n1, n2 = TextNode(text=header), TextNode(text=middle), TextNode(text=body)
    n1.relationships[NodeRelationship.PREVIOUS] = n0.node_id
    n2.relationships[NodeRelationship.PREVIOUS] = n1.node_id
    nodes = [n0, n1, n2]
    idx = build_nodeid2idx(nodes)
    assert get_node_content(n2, 6, nodes=nodes, nodeid2idx=idx) == body


def test_embed_type_6_requires_table_shape():
    n = _node("no table here")
    assert get_node_content(n, 6) == "no table here"


def test_node_with_score_wrapper():
    n = _node("body", know_path="k")
    assert get_node_content(NodeWithScore(node=n, score=1.0), 2) == "###\nk\n\nbody"
