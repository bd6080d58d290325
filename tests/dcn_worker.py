"""Worker process for the true 2-process DCN test (test_multihost.py).

Each worker is one "host": it initializes jax.distributed against a local
coordinator, parses + embeds its round-robin document shard, persists the
shard artifact, and exchanges embeddings over the REAL collective path
(``allgather_shard_embeddings`` — count exchange + padded process_allgather
over gloo). Outputs land in ``<out_dir>/gathered_<pid>.npy`` for the parent
test to compare.

Invoked as: python dcn_worker.py <pid> <nproc> <port> <out_dir>
"""

import sys

import numpy as np


def deterministic_embed(nodes):
    return np.stack(
        [np.full(8, (hash_text(n.text) % 1000) / 1000.0, np.float32) for n in nodes]
    )


def hash_text(text: str) -> int:
    # process-stable hash (builtin hash is salted per process)
    import zlib

    return zlib.crc32(text.encode("utf-8"))


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    out_dir = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")

    # initialize the distributed runtime BEFORE importing the package:
    # importing easyrag_tpu touches the backend (device-resident module
    # constants), and jax.distributed.initialize must run first
    from easyrag_tpu.parallel.multihost import init_distributed

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()

    from easyrag_tpu.corpus.splitter import SentenceSplitter
    from easyrag_tpu.parallel.multihost import allgather_shard_embeddings, build_shard
    from easyrag_tpu.schema import Document

    texts = [
        "扩容指南\nCDU虚机每次扩容的最大SC个数为15。",
        "备份说明\n系统支持全量备份和增量备份。",
        "鉴权配置\n鉴权失败时检查LDAP连接。",
        "升级说明\n升级前需要备份配置文件。",
        "巡检手册\n每日巡检需要检查虚机状态。",
    ]
    docs = [
        Document(text=t, metadata={"file_path": f"d/{i}.txt"})
        for i, t in enumerate(texts)
    ]
    sp = SentenceSplitter(chunk_size=64, chunk_overlap=0, token_counter=len)
    nodes = build_shard(
        docs, pid, nproc, sp.parse_documents, out_dir, embed_fn=deterministic_embed
    )
    local_emb = deterministic_embed(nodes)
    gathered = allgather_shard_embeddings(local_emb)
    np.save(f"{out_dir}/gathered_{pid}.npy", gathered)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
