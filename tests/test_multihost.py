"""Multi-host index build: shard/assemble flow simulated with sequential
"hosts", assembled retrieval equals a single-host build, and a TRUE
2-process jax.distributed run exercising the DCN collective path."""

import os
import socket
import subprocess
import sys

import numpy as np

from easyrag_tpu.corpus.splitter import SentenceSplitter
from easyrag_tpu.corpus.tokenizer import JiebaTokenizer, default_stopwords
from easyrag_tpu.parallel.multihost import assemble_shards, build_shard, shard_documents
from easyrag_tpu.retrievers import BM25Retriever
from easyrag_tpu.schema import Document, QueryBundle


def _docs():
    texts = [
        "扩容指南\nCDU虚机每次扩容的最大SC个数为15。",
        "备份说明\n系统支持全量备份和增量备份。",
        "鉴权配置\n鉴权失败时检查LDAP连接。",
        "升级说明\n升级前需要备份配置文件。",
        "巡检手册\n每日巡检需要检查虚机状态。",
    ]
    return [Document(text=t, metadata={"file_path": f"d/{i}.txt"}) for i, t in enumerate(texts)]


def test_allgather_single_process_identity():
    from easyrag_tpu.parallel.multihost import allgather_shard_embeddings

    emb = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = allgather_shard_embeddings(emb)
    np.testing.assert_array_equal(out, emb)


def test_shard_documents_partition():
    docs = list(range(10))
    shards = [shard_documents(docs, p, 3) for p in range(3)]
    assert sorted(x for s in shards for x in s) == docs
    assert shards[0] == [0, 3, 6, 9]


def test_multihost_build_matches_single_host(tmp_path):
    docs = _docs()
    sp = SentenceSplitter(chunk_size=64, chunk_overlap=0, token_counter=len)

    def parse(shard):
        return sp.parse_documents(shard)

    def embed(nodes):
        # deterministic per-text embedding
        return np.stack(
            [np.full(8, (hash(n.text) % 1000) / 1000.0, np.float32) for n in nodes]
        )

    out = str(tmp_path / "shards")
    # simulate 3 hosts sequentially
    for pid in range(3):
        build_shard(docs, pid, 3, parse, out, embed_fn=embed)
    nodes, emb = assemble_shards(out)
    assert emb is not None and len(emb) == len(nodes)

    # sparse retrieval over the assembled corpus equals a direct build over
    # the same node ordering
    tk = JiebaTokenizer()
    sw = default_stopwords()
    r_multi = BM25Retriever(nodes, tk, sw, similarity_top_k=3, embed_type=0,
                            use_device=False)
    direct_nodes = []
    for pid in range(3):  # same process-concatenation order
        direct_nodes.extend(parse(shard_documents(docs, pid, 3)))
    r_single = BM25Retriever(direct_nodes, tk, sw, similarity_top_k=3, embed_type=0,
                             use_device=False)
    q = QueryBundle(query_str="备份配置文件")
    a = [(n.node.text, round(n.score, 10)) for n in r_multi.retrieve(q)]
    b = [(n.node.text, round(n.score, 10)) for n in r_single.retrieve(q)]
    assert a == b and a


def test_two_process_dcn_allgather(tmp_path):
    """Non-simulated multi-process case: two real OS processes initialize
    jax.distributed against a local coordinator (CPU + gloo collectives) and
    run the count-exchange + padded process_allgather path of
    ``allgather_shard_embeddings``. Every process must end up with the same
    full matrix, equal to the shard artifacts assembled in process order."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dcn_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out = str(tmp_path / "shards")
    os.makedirs(out)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo  # drop the axon site hook; children run pure CPU
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout)
        assert p.returncode == 0, stdout[-2000:]

    from easyrag_tpu.parallel.multihost import assemble_shards

    nodes, assembled = assemble_shards(out)
    assert assembled is not None and len(assembled) == len(nodes)
    g0 = np.load(tmp_path / "shards" / "gathered_0.npy")
    g1 = np.load(tmp_path / "shards" / "gathered_1.npy")
    np.testing.assert_array_equal(g0, g1)
    np.testing.assert_array_equal(g0, assembled)
    # the shards were genuinely ragged (padding path exercised), and the
    # gather really crossed processes
    sizes = {
        len(np.load(tmp_path / "shards" / d / "emb.npy"))
        for d in os.listdir(out)
        if d.startswith("shard_")
    }
    assert len(sizes) > 1, sizes
