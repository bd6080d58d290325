"""Batched on-chip generation and the answer-LLM batching adapter.

Covers the TPU extension that replaces the reference's network generation
stage (``/root/reference/src/easyrag/pipeline/rag.py:26-39``) with the
local KV-cache decoder: ``generate_greedy``'s ``limit``/``active`` args,
``JaxCausalLM.generate_batch``/``warmup``, ``generation.BatchingLocalLLM``
request coalescing, and the ``tpu.local_llm_answer`` pipeline wiring.
"""

import asyncio
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyrag_tpu.models.decode import generate_greedy
from easyrag_tpu.models.layers import init_params

sys.path.insert(0, str(Path(__file__).parent))
from test_decode import VOCAB, run_cached, tiny_cfg  # noqa: E402


def test_limit_caps_decode_steps():
    """``limit`` is a dynamic bound: out[:, :limit] matches the unlimited
    run, later slots stay EOS-filled — and the compiled program is the
    same executable (static shapes unchanged)."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.key(0))
    prompt = [3, 1, 4, 1, 5]
    eos = [VOCAB - 1]
    full = run_cached(cfg, params, prompt, 6, eos)
    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones_like(ids)
    out = generate_greedy(
        cfg, params, ids, mask, jnp.asarray(eos, jnp.int32), 6,
        limit=jnp.int32(2),
    )
    row = list(np.asarray(out[0]))
    assert row[:2] == full[:2]
    assert row[2:] == [eos[0]] * 4


def test_active_masks_padding_rows():
    """Batch-padding rows (active=False) emit only EOS and leave the real
    rows' tokens identical to a solo run."""
    cfg = tiny_cfg(num_key_value_heads=2)
    params = init_params(cfg, jax.random.key(1))
    prompt = [7, 2, 9, 4]
    eos = [VOCAB - 1]
    bucket = 8
    solo = run_cached(cfg, params, prompt, 5, eos, bucket=bucket)
    pad = bucket - len(prompt)
    dummy_row = [0] * (bucket - 1) + [eos[0]]
    dummy_mask = [0] * (bucket - 1) + [1]
    out = generate_greedy(
        cfg,
        params,
        jnp.asarray([[0] * pad + prompt, dummy_row], jnp.int32),
        jnp.asarray([[0] * pad + [1] * len(prompt), dummy_mask], jnp.int32),
        jnp.asarray(eos, jnp.int32),
        5,
        active=jnp.asarray([True, False]),
    )
    assert list(np.asarray(out[0])) == solo
    assert list(np.asarray(out[1])) == [eos[0]] * 5


@pytest.fixture(scope="module")
def tiny_causal_checkpoint(tmp_path_factory):
    """Tiny Qwen2 causal checkpoint + word tokenizer with a chat template
    (the on-disk layout JaxCausalLM loads)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    out = tmp_path_factory.mktemp("models") / "qwen2-tiny-gen"
    torch.manual_seed(11)
    hf_cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attn_implementation="eager",
        tie_word_embeddings=False, eos_token_id=61,
    )
    Qwen2ForCausalLM(hf_cfg).eval().float().save_pretrained(
        str(out), safe_serialization=True
    )
    from test_checkpoint_boot import _word_tokenizer

    tok = _word_tokenizer()
    tok.chat_template = (
        "{% for m in messages %}{{ m['content'] }} {% endfor %}"
        "{% if add_generation_prompt %}w0 {% endif %}"
    )
    tok.save_pretrained(str(out))
    return str(out)


def test_generate_batch_matches_per_query(tiny_causal_checkpoint):
    """Mixed-bucket, chunked batch == per-query results, order preserved."""
    from easyrag_tpu.models.decode import JaxCausalLM

    llm = JaxCausalLM(
        tiny_causal_checkpoint, dtype=jnp.float32, quant="",
        max_new_tokens=6, buckets=(8, 16), max_batch=2,
    )
    queries = [
        "w3 w1 w4",                          # bucket 8
        "w9 w8 w7 w6 w5 w4 w3 w2 w1 w10",    # bucket 16
        "w2 w7 w1",                          # bucket 8
        "w5 w5 w5",                          # bucket 8 (forces a 2nd chunk)
    ]
    want = [llm.generate(q) for q in queries]
    got = llm.generate_batch(queries)
    assert got == want


def test_warmup_compiles_and_leaves_state_clean(tiny_causal_checkpoint):
    """warmup() rounds requested buckets up, runs limit=1 dispatches, and
    generation afterwards is unchanged."""
    from easyrag_tpu.models.decode import JaxCausalLM

    llm = JaxCausalLM(
        tiny_causal_checkpoint, dtype=jnp.float32, quant="",
        max_new_tokens=4, buckets=(8, 16), max_batch=4,
    )
    before = llm.generate("w3 w1 w4")
    llm.warmup(buckets=(5, 16), batch_sizes=(1, 2))  # 5 rounds up to 8
    assert llm.generate("w3 w1 w4") == before


class _FakeModel:
    def __init__(self):
        self.calls = []

    def generate_batch(self, prompts):
        self.calls.append(list(prompts))
        return [f"ans:{p}" for p in prompts]


def test_batching_llm_coalesces_concurrent_requests():
    """Concurrent acomplete calls within the window fuse into one
    generate_batch dispatch; results map back in order."""
    from easyrag_tpu.generation import BatchingLocalLLM

    model = _FakeModel()
    llm = BatchingLocalLLM(model, window_ms=20.0, max_batch=8)

    async def drive():
        return await asyncio.gather(*(llm.acomplete(f"q{i}") for i in range(4)))

    res = asyncio.new_event_loop().run_until_complete(drive())
    assert [r.text for r in res] == [f"ans:q{i}" for i in range(4)]
    assert len(model.calls) == 1 and model.calls[0] == [f"q{i}" for i in range(4)]
    assert llm.dispatches == 1


def test_batching_llm_max_batch_cut_drains_backlog():
    from easyrag_tpu.generation import BatchingLocalLLM

    model = _FakeModel()
    llm = BatchingLocalLLM(model, window_ms=5.0, max_batch=2)

    async def drive():
        return await asyncio.gather(*(llm.acomplete(f"q{i}") for i in range(5)))

    res = asyncio.new_event_loop().run_until_complete(drive())
    assert [r.text for r in res] == [f"ans:q{i}" for i in range(5)]
    assert all(len(c) <= 2 for c in model.calls)
    assert sum(len(c) for c in model.calls) == 5


def test_batching_llm_error_fans_out():
    from easyrag_tpu.generation import BatchingLocalLLM

    class Boom:
        def generate_batch(self, prompts):
            raise RuntimeError("chip on fire")

    llm = BatchingLocalLLM(Boom(), window_ms=1.0, max_batch=4)

    async def drive():
        return await asyncio.gather(
            *(llm.acomplete(f"q{i}") for i in range(3)), return_exceptions=True
        )

    res = asyncio.new_event_loop().run_until_complete(drive())
    assert all(isinstance(r, RuntimeError) for r in res)


def test_pipeline_local_llm_answer_wiring(tiny_causal_checkpoint, tmp_path):
    """``tpu.local_llm_answer`` makes the local decoder the answer LLM:
    run() produces the answer with zero network calls."""
    import json

    from easyrag_tpu.config import EasyRAGConfig, TPUConfig
    from easyrag_tpu.generation import BatchingLocalLLM
    from easyrag_tpu.pipeline import EasyRAGPipeline

    root = tmp_path / "corpus"
    (root / "director").mkdir(parents=True)
    (root / "director" / "a.txt").write_text(
        "w1 w2 w3\nw1 w2 w3 w4 w5。\n", encoding="utf-8"
    )
    (root / "pathmap.json").write_text(
        json.dumps({"director/a.txt": ["k", "a"]}), encoding="utf-8"
    )
    cfg = EasyRAGConfig(
        retrieval_type=2,
        use_reranker=0,
        chunk_size=64,
        chunk_overlap=10,
        data_path=str(root),
        f_topk_2=2,
        f_topk_3=0,
        local_llm_name=tiny_causal_checkpoint,
        cache_path=str(tmp_path / "cache"),
        tpu=TPUConfig(
            use_pallas=False,
            local_llm_answer=True,
            local_llm_quant="",
            local_llm_max_new=4,
            local_llm_gen_batch=2,
        ),
    )
    pipeline = EasyRAGPipeline(cfg)
    assert isinstance(pipeline.llm, BatchingLocalLLM)
    assert pipeline.local_llm is not None
    res = asyncio.new_event_loop().run_until_complete(
        pipeline.run({"query": "w1 w2 w3"})
    )
    assert isinstance(res["answer"], str)
    # the answer went through the batching adapter's device dispatch
    assert pipeline.llm.dispatches == 1


def test_spec_wrapper_matches_plain(tiny_causal_checkpoint):
    """tpu.local_llm_spec through the JaxCausalLM surface: identical text
    to the plain decoder (exact-greedy acceptance), single and batched,
    and warmup (which must also compile the verify block) stays clean."""
    from easyrag_tpu.models.decode import JaxCausalLM

    plain = JaxCausalLM(
        tiny_causal_checkpoint, dtype=jnp.float32, quant="",
        max_new_tokens=6, buckets=(8, 16), max_batch=2,
    )
    spec = JaxCausalLM(
        tiny_causal_checkpoint, dtype=jnp.float32, quant="",
        max_new_tokens=6, buckets=(8, 16), max_batch=2,
        spec_tokens=3, spec_ngram=2,
    )
    spec.warmup(buckets=(8,), batch_sizes=(1,))
    queries = ["w3 w1 w4", "w9 w8 w7 w6 w5 w4 w3 w2 w1 w10", "w5 w5 w5"]
    assert spec.generate_batch(queries) == plain.generate_batch(queries)


def test_run_answers_batch_matches_sequential(tiny_causal_checkpoint, tmp_path):
    """``run_answers_batch`` (staged: one retrieval stream -> rerank ->
    bucketed gen_batch decodes) returns the same answers/nodes/contexts as
    the sequential per-query ``run`` loop — the reference's batch-eval
    shape (``/root/reference/src/main.py:48-52``) staged TPU-first."""
    import json

    from easyrag_tpu.config import EasyRAGConfig, TPUConfig
    from easyrag_tpu.pipeline import EasyRAGPipeline

    root = tmp_path / "corpus"
    (root / "director").mkdir(parents=True)
    (root / "director" / "a.txt").write_text(
        "w1 w2 w3\nw1 w2 w3 w4 w5。\n", encoding="utf-8"
    )
    (root / "director" / "b.txt").write_text(
        "w7 w8\nw7 w8 w9。\n", encoding="utf-8"
    )
    # a third doc keeps df < N AND df+0.5 < N-df+0.5: at N=2/df=1 Okapi's
    # idf is ln(1.5/1.5) = 0 exactly, so every score drops (faithfully)
    (root / "director" / "c.txt").write_text(
        "x1 x2\nx1 x2 x3。\n", encoding="utf-8"
    )
    (root / "pathmap.json").write_text(
        json.dumps({"director/a.txt": ["k", "a"], "director/b.txt": ["k", "b"],
                    "director/c.txt": ["k", "c"]}),
        encoding="utf-8",
    )
    cfg = EasyRAGConfig(
        retrieval_type=2,
        use_reranker=0,
        chunk_size=64,
        chunk_overlap=10,
        data_path=str(root),
        f_topk_2=2,
        f_topk_3=1,
        local_llm_name=tiny_causal_checkpoint,
        cache_path=str(tmp_path / "cache"),
        tpu=TPUConfig(
            use_pallas=False,
            local_llm_answer=True,
            local_llm_quant="",
            local_llm_max_new=4,
            local_llm_gen_batch=2,
        ),
    )
    pipeline = EasyRAGPipeline(cfg)
    queries = [{"query": "w1 w2 w3"}, {"query": "w7 w8"}, {"query": "w4 w5"}]
    loop = asyncio.new_event_loop()
    seq = [loop.run_until_complete(pipeline.run(dict(q))) for q in queries]
    batch = loop.run_until_complete(pipeline.run_answers_batch(queries))
    assert any(r["contexts"] for r in batch)  # parity must not be vacuous
    assert [r["answer"] for r in batch] == [r["answer"] for r in seq]
    assert [r["contexts"] for r in batch] == [r["contexts"] for r in seq]
    assert [
        [n.node.idx for n in r["nodes"]] for r in batch
    ] == [[n.node.idx for n in r["nodes"]] for r in seq]


def test_run_answers_batch_falls_back_when_unstageable(
    tiny_causal_checkpoint, tmp_path
):
    """Non-default paths fall back to the sequential loop (same results
    contract), rather than silently skipping stages."""
    import json

    from easyrag_tpu.config import EasyRAGConfig, TPUConfig
    from easyrag_tpu.pipeline import EasyRAGPipeline

    root = tmp_path / "corpus"
    (root / "director").mkdir(parents=True)
    (root / "director" / "a.txt").write_text(
        "w1 w2 w3\nw1 w2 w3 w4 w5。\n", encoding="utf-8"
    )
    (root / "director" / "b.txt").write_text(
        "w7 w8\nw7 w8 w9。\n", encoding="utf-8"
    )
    # a third doc keeps df < N AND df+0.5 < N-df+0.5: at N=2/df=1 Okapi's
    # idf is ln(1.5/1.5) = 0 exactly, so every score drops (faithfully)
    (root / "director" / "c.txt").write_text(
        "x1 x2\nx1 x2 x3。\n", encoding="utf-8"
    )
    (root / "pathmap.json").write_text(
        json.dumps({"director/a.txt": ["k", "a"], "director/b.txt": ["k", "b"],
                    "director/c.txt": ["k", "c"]}),
        encoding="utf-8",
    )
    cfg = EasyRAGConfig(
        retrieval_type=2,
        use_reranker=0,
        chunk_size=64,
        chunk_overlap=10,
        data_path=str(root),
        f_topk_2=2,
        f_topk_3=0,
        ans_refine_type=2,  # exercises the refine concat in both paths
        local_llm_name=tiny_causal_checkpoint,
        cache_path=str(tmp_path / "cache"),
        tpu=TPUConfig(
            use_pallas=False,
            local_llm_answer=True,
            local_llm_quant="",
            local_llm_max_new=4,
            local_llm_gen_batch=2,
        ),
    )
    pipeline = EasyRAGPipeline(cfg)
    loop = asyncio.new_event_loop()
    q = {"query": "w1 w2 w3"}
    seq = loop.run_until_complete(pipeline.run(dict(q)))
    batch = loop.run_until_complete(pipeline.run_answers_batch([q]))
    assert batch[0]["answer"] == seq["answer"]
    assert batch[0]["answer"].endswith(batch[0]["contexts"][0])


def test_run_answers_batch_falls_back_when_answer_llm_is_not_local(
    tiny_causal_checkpoint, tmp_path
):
    """With ``local_llm_name`` set but the answer LLM being something else
    (``tpu.local_llm_answer`` off / an injected network client), the staged
    path must NOT generate via the local decoder — it falls back to the
    sequential loop so both paths answer with the same model (advisor r4,
    medium: divergent-answers hazard)."""
    import json

    from easyrag_tpu.config import EasyRAGConfig, TPUConfig
    from easyrag_tpu.generation import CompletionResponse
    from easyrag_tpu.pipeline import EasyRAGPipeline

    root = tmp_path / "corpus"
    (root / "director").mkdir(parents=True)
    (root / "director" / "a.txt").write_text(
        "w1 w2 w3\nw1 w2 w3 w4 w5。\n", encoding="utf-8"
    )
    (root / "director" / "b.txt").write_text(
        "w7 w8\nw7 w8 w9。\n", encoding="utf-8"
    )
    (root / "director" / "c.txt").write_text(
        "x1 x2\nx1 x2 x3。\n", encoding="utf-8"
    )
    (root / "pathmap.json").write_text(
        json.dumps({"director/a.txt": ["k", "a"], "director/b.txt": ["k", "b"],
                    "director/c.txt": ["k", "c"]}),
        encoding="utf-8",
    )

    class NetworkLLM:
        """Stand-in for the GLM-4 client: answers must come from HERE."""

        async def acomplete(self, prompt: str):
            return CompletionResponse(text="network-answer")

    cfg = EasyRAGConfig(
        retrieval_type=2,
        use_reranker=0,
        chunk_size=64,
        chunk_overlap=10,
        data_path=str(root),
        f_topk_2=2,
        f_topk_3=1,
        local_llm_name=tiny_causal_checkpoint,  # built, but NOT the answerer
        cache_path=str(tmp_path / "cache"),
        tpu=TPUConfig(
            use_pallas=False,
            local_llm_quant="",
            local_llm_max_new=4,
            local_llm_gen_batch=2,
        ),
    )
    pipeline = EasyRAGPipeline(cfg, llm=NetworkLLM())
    assert pipeline.local_llm is not None  # the hazard configuration
    assert not pipeline._answers_via_local_llm()
    loop = asyncio.new_event_loop()
    queries = [{"query": "w1 w2 w3"}, {"query": "w7 w8"}]
    batch = loop.run_until_complete(pipeline.run_answers_batch(queries))
    assert [r["answer"] for r in batch] == ["network-answer", "network-answer"]
