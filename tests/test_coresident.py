"""Co-resident whole-system boot: every serving component loaded together
and driven through the REAL ``run(query)`` path — the wiring that
``tools/bench_pipeline.py`` measures at true scale on hardware
(VERDICT r2 item #1). Tiny shapes on the CPU mesh here; the components are
the real classes: ``MiniCPMLayerWiseReranker`` (incl. both early-exit
variants), int8-leaf embedder params through ``forward_hidden``, a
``DenseIndex``, and the resident sparse dual route inside
``EasyRAGPipeline``.
"""

import asyncio
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_pipeline import (  # noqa: E402
    CharTokenizer,
    StubLLM,
    build_corpus_on_disk,
    make_embedder_params_int8,
)

from easyrag_tpu.config import EasyRAGConfig, TPUConfig  # noqa: E402
from easyrag_tpu.index.dense import DenseIndex  # noqa: E402
from easyrag_tpu.models.layers import DecoderConfig, forward_hidden, init_params  # noqa: E402
from easyrag_tpu.models.minicpm import MiniCPMLayerWiseReranker  # noqa: E402
from easyrag_tpu.pipeline import EasyRAGPipeline  # noqa: E402
from easyrag_tpu.rerankers import LLMRerank  # noqa: E402


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    rng = np.random.default_rng(0)
    corpus = str(tmp_path_factory.mktemp("pipe") / "corpus")
    build_corpus_on_disk(corpus, 60, rng)

    rr_cfg = DecoderConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_attention_heads=2, num_key_value_heads=2,
        num_hidden_layers=4, scale_emb=12.0, scale_depth=1.4,
        dim_model_base=32.0, dtype=jnp.float32,
    )
    rr_params = init_params(rr_cfg, jax.random.key(0))
    rr_params["heads"] = {
        layer: jnp.asarray(
            np.random.default_rng(layer).normal(size=(1, 64)), jnp.float32
        )
        for layer in range(1, 5)
    }
    scorer = MiniCPMLayerWiseReranker(
        rr_cfg, rr_params, CharTokenizer(512),
        start_layer=1, cutoff_layer=3, efficient_layers=(2,),
        max_length=128,
    )
    reranker = LLMRerank(scorer, top_n=3, embed_bs=4, embed_type=0)

    em_cfg = DecoderConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        attention_bias=True, dtype=jnp.float32,
    )
    em_params = make_embedder_params_int8(em_cfg, jax.random.key(7))

    dmat = jnp.asarray(rng.normal(size=(60, 32)), jnp.float32)
    dmat = dmat / jnp.linalg.norm(dmat, axis=1, keepdims=True)
    dense = DenseIndex(matrix=dmat)

    cfg = EasyRAGConfig(
        re_only=False, retrieval_type=2, use_reranker=2,
        data_path=corpus, chunk_size=384, chunk_overlap=0,
        f_topk_2=8, f_topk_3=2, r_topk=3,
        tpu=TPUConfig(use_pallas=False),
    )
    pipeline = EasyRAGPipeline(cfg, llm=StubLLM(), reranker=reranker)
    return pipeline, scorer, reranker, (em_cfg, em_params), dense


def _run(pipeline, query):
    return asyncio.new_event_loop().run_until_complete(pipeline.run(query))


def test_full_route_with_all_components(system):
    pipeline, scorer, reranker, (em_cfg, em_params), dense = system
    node = pipeline.nodes[0]
    q = " ".join(node.get_content().split()[:6])
    res = _run(pipeline, {"query": q})
    # generation stubbed, rerank real: top-3 contexts with scored nodes
    assert res["answer"] == "无法确定"
    assert len(res["nodes"]) == 3
    assert all(isinstance(n.score, float) for n in res["nodes"])

    # the co-resident embedder + dense index still serve (route liveness)
    ids = jnp.asarray(np.arange(2 * 8).reshape(2, 8) % 256, jnp.int32)
    h = forward_hidden(em_cfg, em_params, ids, jnp.ones((2, 8), jnp.int32))
    assert h.shape == (2, 8, 64) and bool(jnp.isfinite(h).all())
    tv, ti = dense.query(np.asarray(h[:, -1, :32], np.float32), 4)
    assert ti.shape == (2, 4)


@pytest.mark.parametrize("t,expect_exit", [(0.0, True), (2.0, False)])
def test_full_route_early_exit_variants(system, t, expect_exit):
    """The benchmark's exit-taken / exit-declined modes through run()."""
    pipeline, scorer, reranker, _, _ = system
    scorer.use_efficient = 1
    reranker.use_efficient = 1
    scorer.efficient_t = t
    try:
        layers = []
        orig = scorer.score_pairs

        def spy(pairs, judge=False):
            scores, layer = orig(pairs, judge=judge)
            layers.append((judge, layer))
            return scores, layer

        scorer.score_pairs = spy
        q = " ".join(pipeline.nodes[1].get_content().split()[:6])
        res = _run(pipeline, {"query": q})
        assert len(res["nodes"]) == 3
        scorer.score_pairs = orig
        assert layers and layers[0][0] is True  # first batch judges
        if expect_exit:
            assert layers[0][1] == 2  # exits at the judge layer
            # discovered layer reused for the remaining batches
            assert all(l == 2 for _, l in layers)
        else:
            assert layers[0][1] == 3  # declined: ran to cutoff
    finally:
        scorer.score_pairs = orig
        scorer.use_efficient = 0
        reranker.use_efficient = 0
        scorer.cutoff_layer = 3
