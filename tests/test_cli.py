"""Batch CLI end-to-end (subprocess, CPU, re_only) and embedder batching."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_val_split_end_to_end(tmp_path):
    corpus = tmp_path / "corpus"
    (corpus / "director").mkdir(parents=True)
    (corpus / "umac").mkdir()
    (corpus / "director" / "a.txt").write_text(
        "扩容指南\nCDU虚机每次扩容的最大SC个数为15。\n", encoding="utf-8"
    )
    (corpus / "director" / "b.txt").write_text(
        "备份说明\n系统支持全量备份和增量备份。\n", encoding="utf-8"
    )
    (corpus / "umac" / "c.txt").write_text(
        "鉴权配置\n鉴权失败时检查LDAP连接。\n", encoding="utf-8"
    )
    (corpus / "pathmap.json").write_text(
        json.dumps(
            {
                "director/a.txt": ["运维", "扩容"],
                "director/b.txt": ["运维", "备份"],
                "umac/c.txt": ["安全", "鉴权"],
            }
        ),
        encoding="utf-8",
    )
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
re_only: true
retrieval_type: 2
use_reranker: 0
chunk_size: 64
chunk_overlap: 10
f_topk_2: 4
f_topk_3: 1
data_path: {corpus}
tpu:
  use_pallas: false
""",
        encoding="utf-8",
    )
    qa_dir = tmp_path / "qa"
    qa_dir.mkdir()
    (qa_dir / "val.json").write_text(
        json.dumps(
            [
                {"id": 1, "query": "CDU扩容的最大SC个数？", "answer": "15",
                 "keywords": ["15"], "document": ""},
            ],
            ensure_ascii=False,
        ),
        encoding="utf-8",
    )
    env = dict(os.environ)
    # run the child on plain CPU: drop the axon site hook (its tunnel
    # handshake blocks for minutes under contention) and the virtual-device
    # XLA flags the parent test session uses
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [
            sys.executable, "-m", "easyrag_tpu.cli",
            "--config", str(cfg), "--split", "val", "--re-only",
            "--note", "t", "--qa-dir", str(qa_dir),
            # fire-style arbitrary overrides (src/main.py:21-32): shrink the
            # sparse route to prove non-flag knobs reach the pipeline
            "--set", "f_topk_2=1", "--set", "f_topk_3=0",
            "--set", "tpu.query_batch=16",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,  # CPU jit of the retrieval kernels varies with machine load
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "average acc" in out.stdout
    rows = [
        json.loads(l)
        for l in open(tmp_path / "outputs" / "submit_result_val_t.jsonl", encoding="utf-8")
    ]
    assert rows[0]["id"] == 1 and rows[0]["answer"] == ""
    inter = json.load(open(tmp_path / "inter" / "val_t.json", encoding="utf-8"))
    assert inter[0]["candidates"] and "CDU" in inter[0]["candidates"][0]
    assert inter[0]["paths"][0] == "director/a.txt"
    # --set f_topk_2=1 / f_topk_3=0 took effect end-to-end
    assert len(inter[0]["candidates"]) == 1


def test_set_override_parsing_and_merge(tmp_path):
    from easyrag_tpu.config import apply_overrides, load_config, parse_override

    assert parse_override("f_topk_2=7") == ("f_topk_2", 7)
    assert parse_override("compress_rate=0.25") == ("compress_rate", 0.25)
    assert parse_override("re_only=true") == ("re_only", True)
    assert parse_override("note=best") == ("note", "best")
    assert parse_override("llm_keys=[a, b]") == ("llm_keys", ["a", "b"])
    assert parse_override("tpu.query_batch=16") == ("tpu.query_batch", 16)
    try:
        parse_override("no-equals")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    raw = {"tpu": {"use_pallas": False}}
    apply_overrides(raw, {"tpu.query_batch": 16, "f_topk": 9, "unknown_knob": 1})
    assert raw == {
        "tpu": {"use_pallas": False, "query_batch": 16},
        "f_topk": 9,
        "unknown_knob": 1,
    }

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("retrieval_type: 2\nf_topk_2: 192\n", encoding="utf-8")
    cfg = load_config(
        str(cfg_file),
        set_specs=["f_topk_2=5", "tpu.query_batch=16", "custom_extra=x"],
    )
    assert cfg.f_topk_2 == 5
    assert cfg.tpu.query_batch == 16
    # unknown keys survive like fire's dict merge (EasyRAGConfig.extra)
    assert cfg.extra["custom_extra"] == "x"

    # a bare `tpu:` line parses to None — dotted overrides must still land
    cfg_file2 = tmp_path / "c2.yaml"
    cfg_file2.write_text("retrieval_type: 2\ntpu:\n", encoding="utf-8")
    cfg2 = load_config(str(cfg_file2), set_specs=["tpu.query_batch=8"])
    assert cfg2.tpu.query_batch == 8

    # unknown tpu.* knobs survive in extra instead of a TypeError
    cfg3 = load_config(str(cfg_file), set_specs=["tpu.not_a_knob=1"])
    assert cfg3.extra["tpu.not_a_knob"] == 1


def test_embedder_bucketing_shapes():
    import jax
    import jax.numpy as jnp

    from easyrag_tpu.models.layers import DecoderConfig, init_params
    from easyrag_tpu.models.qwen2 import GTEEmbedder

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        attention_bias=True, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(0))

    class FakeTok:
        def __call__(self, texts, max_length=None, padding=True, truncation=True,
                     return_tensors=None):
            rows = [[(hash(c) % 60) + 2 for c in t][:max_length] for t in texts]
            width = max(len(r) for r in rows)
            ids = np.zeros((len(rows), width), np.int32)
            mask = np.zeros((len(rows), width), np.int32)
            for i, r in enumerate(rows):
                ids[i, : len(r)] = r
                mask[i, : len(r)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    emb = GTEEmbedder(cfg, params, FakeTok(), max_length=512, embed_batch_size=8,
                      batch_buckets=(1, 4, 8))
    out = emb.get_text_embeddings(["短", "长一点的文本内容", "abc", "x" * 100, "y"])
    assert out.shape == (5, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    # query embedding uses the instruct prefix -> differs from text embedding
    q = emb.get_query_embedding("相同文本")
    t = emb.get_text_embedding("相同文本")
    assert not np.allclose(q, t)
    # deterministic
    np.testing.assert_allclose(emb.get_text_embedding("abc"), out[2], rtol=1e-5)


def test_cascade_knobs_config_reachable(tmp_path):
    """r_use_efficient=3 + tpu.cascade_keep reach the pipeline through the
    same --set machinery as every other knob."""
    from easyrag_tpu.config import load_config

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("retrieval_type: 2\n", encoding="utf-8")
    cfg = load_config(
        str(cfg_file),
        set_specs=["r_use_efficient=3", "tpu.cascade_keep=64"],
    )
    assert cfg.r_use_efficient == 3
    assert cfg.tpu.cascade_keep == 64
