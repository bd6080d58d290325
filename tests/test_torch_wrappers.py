"""Torch compatibility wrappers exercised against tiny on-disk models.

``STEmbedder`` mirrors the sentence-transformers embedding path the reference
selects for non-GTE model names (``src/easyrag/custom/embeddings/hf_embeddings.py:80-143``);
``SentenceTransformerRerank`` mirrors the CrossEncoder reranker
(``src/easyrag/custom/rerankers.py:15-99``). Both are thin delegates, but
sentence-transformers IS installed in this image, so they get real tests:
a tiny BERT + WordPiece vocab is built on disk (no network) and loaded
through the exact ``from_pretrained``/ctor paths the pipeline uses.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("sentence_transformers")

from easyrag_tpu.schema import NodeWithScore, QueryBundle, TextNode


@pytest.fixture(scope="module")
def tiny_models(tmp_path_factory):
    """Build a tiny BERT backbone + tokenizer, saved as (a) a
    SentenceTransformer directory and (b) a sequence-classification
    (CrossEncoder) directory."""
    from transformers import (
        BertConfig,
        BertForSequenceClassification,
        BertModel,
        BertTokenizer,
    )
    from sentence_transformers import SentenceTransformer, models

    root = tmp_path_factory.mktemp("tiny_st")
    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + list("abcdefghijklmnopqrstuvwxyz0123456789")
        + list("扩容备份鉴权的是最大个数检查连接系统支持全量")
    )
    base = root / "base"
    base.mkdir()
    (base / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    tok = BertTokenizer(str(base / "vocab.txt"))
    cfg_kw = dict(
        vocab_size=len(vocab),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    BertModel(BertConfig(**cfg_kw)).save_pretrained(base)
    tok.save_pretrained(base)

    word = models.Transformer(str(base), max_seq_length=64)
    pool = models.Pooling(word.get_word_embedding_dimension())
    st_dir = root / "st"
    SentenceTransformer(modules=[word, pool]).save(str(st_dir))

    ce_dir = root / "ce"
    ce_dir.mkdir()
    torch.manual_seed(1)
    BertForSequenceClassification(
        BertConfig(**cfg_kw, num_labels=1)
    ).save_pretrained(ce_dir)
    tok.save_pretrained(ce_dir)
    return str(st_dir), str(ce_dir)


def test_st_embedder_end_to_end(tiny_models):
    from easyrag_tpu.models.st_embedder import STEmbedder

    st_dir, _ = tiny_models
    emb = STEmbedder.from_pretrained(
        st_dir, query_instruction="为这个句子生成表示以用于检索相关文章：", max_length=48
    )
    assert emb.model.max_seq_length == 48

    texts = ["扩容 的 最大 个 数", "备份 系统 支持", "鉴权 检查 连接"]
    mat = emb.get_text_embeddings(texts)
    assert mat.shape == (3, 32)
    # normalize_embeddings=True -> unit rows (hf_embeddings.py encodes with
    # normalization so cosine == dot for the dense index)
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, rtol=1e-5)
    # single-text forms agree with the batched form
    np.testing.assert_allclose(emb.get_text_embedding(texts[0]), mat[0], rtol=1e-5)
    # the query prompt is prepended -> query embedding differs from text
    q = emb.get_query_embedding("扩容 的 最大 个 数")
    assert not np.allclose(q, mat[0])
    np.testing.assert_allclose(
        emb.get_query_embeddings([texts[0]])[0], q, rtol=1e-5
    )
    # prompt_name="query" is exactly prefix-concatenation for this model
    manual = emb.model.encode(
        ["为这个句子生成表示以用于检索相关文章：" + texts[0]], normalize_embeddings=True
    )[0]
    np.testing.assert_allclose(q, manual, rtol=1e-4, atol=1e-6)


def test_st_embedder_embed_nodes_uses_content_views(tiny_models):
    from easyrag_tpu.models.st_embedder import STEmbedder

    st_dir, _ = tiny_models
    emb = STEmbedder.from_pretrained(st_dir, embed_type=1)
    node = TextNode(
        text="扩容 的 最大 个 数",
        metadata={"file_path": "director/a.txt", "know_path": "运维/扩容"},
    )
    # embed_type=1 renders ###\n<file_path>\n\n<text> (ingestion.py:58-60)
    got = emb.embed_nodes([node])
    want = emb.get_text_embeddings(["###\ndirector/a.txt\n\n扩容 的 最大 个 数"])
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # per-call override wins over the ctor default
    got5 = emb.embed_nodes([node], embed_type=5)
    want5 = emb.get_text_embeddings(["运维/扩容"])
    np.testing.assert_allclose(got5, want5, rtol=1e-5)


def test_sentence_transformer_rerank_semantics(tiny_models, monkeypatch):
    import easyrag_tpu.rerankers as rr

    _, ce_dir = tiny_models
    reranker = rr.SentenceTransformerRerank(
        top_n=2, model=ce_dir, keep_retrieval_score=True, max_length=64
    )
    nodes = [
        NodeWithScore(TextNode(text="扩容 的 最大 个 数 是"), score=0.9),
        NodeWithScore(TextNode(text="备份 系统 支持 全量"), score=0.8),
        NodeWithScore(TextNode(text="鉴权 检查 连接"), score=0.7),
    ]
    qb = QueryBundle(query_str="扩容 最大 个 数")
    # parity with a direct CrossEncoder.predict over the same pairs
    direct = reranker._model.predict(
        [(qb.query_str, n.node.get_content()) for n in nodes]
    )
    out = reranker.postprocess_nodes(list(nodes), qb)
    assert len(out) == 2
    order = np.argsort(-direct)
    assert [n.node.get_content() for n in out] == [
        nodes[i].node.get_content() for i in order[:2]
    ]
    np.testing.assert_allclose(
        [n.score for n in out], np.sort(direct)[::-1][:2], rtol=1e-5
    )
    # retrieval score preserved in metadata (rerankers.py:88-90)
    assert out[0].node.metadata["retrieval_score"] in (0.9, 0.8, 0.7)

    # empty input short-circuits; missing bundle raises (rerankers.py:63-70)
    assert reranker.postprocess_nodes([], qb) == []
    with pytest.raises(ValueError):
        reranker.postprocess_nodes(list(nodes), None)
