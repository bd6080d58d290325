"""Cross-request reranker coalescing (serving.coalesce.CoalescingScorer).

The reference serves strictly per-request; this framework fuses reranker
batches across concurrent full-RAG requests (the stage that dominates
query cost, SURVEY §3 hot loop #1). Tests: fused dispatches preserve exact
scores, the judge protocol stays un-fused with per-thread cutoff isolation,
errors fan out, and a live API with concurrent requests shares dispatches.
"""

import asyncio
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from easyrag_tpu.rerankers import LLMRerank
from easyrag_tpu.schema import NodeWithScore, QueryBundle, TextNode
from easyrag_tpu.serving.coalesce import CoalescingScorer


class FakeScorer:
    """Deterministic, composition-independent pair scorer: score encodes the
    active cutoff so tests can observe which depth scored each pair."""

    def __init__(self, judge_layer=12):
        self.cutoff_layer = 28
        self.judge_layer = judge_layer
        self.calls = []  # (n_pairs, judge, cutoff)
        self._lock = threading.Lock()

    def score_pairs(self, pairs, judge=False):
        with self._lock:
            self.calls.append((len(pairs), judge, self.cutoff_layer))
        if judge:
            return (
                np.array([float(len(p)) for _, p in pairs], np.float32),
                self.judge_layer,
            )
        return (
            np.array(
                [self.cutoff_layer * 1000.0 + len(p) for _, p in pairs], np.float32
            ),
            self.cutoff_layer,
        )


def _nodes(prefix, n):
    return [
        NodeWithScore(TextNode(text=prefix * (i + 1)), score=0.5) for i in range(n)
    ]


def test_concurrent_requests_share_dispatches():
    fake = FakeScorer()
    proxy = CoalescingScorer(fake, max_batch=4, window_ms=80)
    reranker = LLMRerank(proxy, top_n=100, embed_bs=4, embed_type=0)
    sizes = [5, 6, 7]
    barrier = threading.Barrier(len(sizes))

    def run(i):
        barrier.wait()
        nodes = _nodes(chr(ord("a") + i), sizes[i])
        return reranker.postprocess_nodes(nodes, QueryBundle(query_str=f"q{i}"))

    with ThreadPoolExecutor(len(sizes)) as pool:
        outs = list(pool.map(run, range(len(sizes))))
    proxy.close()

    # exact scores: composition-independent scorer -> same as a serial run
    for i, out in enumerate(outs):
        serial = LLMRerank(FakeScorer(), top_n=100, embed_bs=4, embed_type=0)
        expect = serial.postprocess_nodes(
            _nodes(chr(ord("a") + i), sizes[i]), QueryBundle(query_str=f"q{i}")
        )
        assert [n.score for n in out] == [n.score for n in expect]

    # sharing: 18 pairs in chunks of 4 -> at most 5 device dispatches once
    # fused; the legacy per-request loop would take 2+2+2 = 6
    assert sum(n for n, _, _ in fake.calls) >= 18
    assert len(fake.calls) <= 5, fake.calls
    # every dispatch hit the full compiled batch shape
    assert all(n == 4 for n, _, _ in fake.calls)


def test_judge_protocol_unfused_with_cutoff_isolation():
    fake = FakeScorer(judge_layer=12)
    proxy = CoalescingScorer(fake, max_batch=4, window_ms=60)
    reranker = LLMRerank(
        proxy, top_n=100, embed_bs=4, embed_type=0, use_efficient=1
    )
    barrier = threading.Barrier(2)

    def run(i):
        barrier.wait()
        nodes = _nodes("xy"[i], 6)
        return reranker.postprocess_nodes(nodes, QueryBundle(query_str=f"q{i}"))

    with ThreadPoolExecutor(2) as pool:
        outs = list(pool.map(run, range(2)))
    proxy.close()

    judge_calls = [c for c in fake.calls if c[1]]
    rest_calls = [c for c in fake.calls if not c[1]]
    # each request judged its own first batch, un-fused
    assert len(judge_calls) == 2 and all(n == 4 for n, _, _ in judge_calls)
    # remaining pairs scored at the DISCOVERED layer (12), and since both
    # requests discovered the same layer they may fuse (2+2 pairs -> 1 chunk)
    assert all(cut == 12 for _, _, cut in rest_calls)
    for out in outs:
        # the 2 tail pairs carry cutoff-encoded scores (12xxx), the 4 judge
        # pairs small ones — the largest two scores must come from layer 12
        tail_scores = sorted(n.score for n in out)[-2:]
        assert all(12000 <= s < 13000 for s in tail_scores)
    # the proxy restored the real scorer's cutoff after each group
    assert fake.cutoff_layer == 28
    # per-thread view: the main thread still sees the default
    assert proxy.cutoff_layer == 28


def test_coalescer_tolerates_yes_logit_scorer():
    """YesLogitScorer exposes cutoff_layer (the scorer protocol), so the
    generic-reranker serve path coalesces without AttributeError."""
    import jax

    from easyrag_tpu.models.layers import DecoderConfig, init_params
    from easyrag_tpu.models.yes_logit import YesLogitScorer

    cfg = DecoderConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
    )
    params = init_params(cfg, jax.random.key(0))

    class FakeTok:
        bos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, add_special_tokens=False, max_length=None,
                     truncation=False):
            ids = [(hash(ch) % 120) + 2 for ch in text]
            if max_length is not None and truncation:
                ids = ids[:max_length]
            return {"input_ids": ids}

    scorer = YesLogitScorer(cfg, params, FakeTok(), max_length=64)
    assert scorer.cutoff_layer == 2
    proxy = CoalescingScorer(scorer, max_batch=2, window_ms=10)
    try:
        scores, layer = proxy.score_pairs([("q", "p"), ("q2", "p2")])
        assert scores.shape == (2,) and layer == 2
    finally:
        proxy.close()


def test_error_fans_out_to_all_fused_requests():
    class Boom(FakeScorer):
        def score_pairs(self, pairs, judge=False):
            raise RuntimeError("device gone")

    proxy = CoalescingScorer(Boom(), max_batch=4, window_ms=40)
    barrier = threading.Barrier(2)

    def run(i):
        barrier.wait()
        with pytest.raises(RuntimeError, match="device gone"):
            proxy.score_pairs([("q", "p")], judge=False)
        return True

    with ThreadPoolExecutor(2) as pool:
        assert all(pool.map(run, range(2)))
    proxy.close()


def test_api_concurrent_full_rag_shares_reranker_dispatches(tmp_path):
    """Live-socket test: concurrent POST /v1/rag requests on a full-RAG
    pipeline (reranker + generation) share reranker device dispatches."""
    from easyrag_tpu.config import EasyRAGConfig, TPUConfig
    from easyrag_tpu.pipeline import EasyRAGPipeline
    from easyrag_tpu.serving.api import create_app

    root = tmp_path / "corpus"
    (root / "director").mkdir(parents=True)
    (root / "umac").mkdir()
    (root / "director" / "scale.txt").write_text(
        "CDU虚机扩容指南\nCDU虚机每次扩容的最大SC个数为15，步长为3。扩容前需检查资源池容量。\n\n\n"
        "GSU虚机每次扩容的最大SC个数为5，步长为1。扩容需在维护窗口执行。\n",
        encoding="utf-8",
    )
    (root / "director" / "backup.txt").write_text(
        "数据备份说明\n系统支持全量备份和增量备份，备份文件存储在共享存储上。\n",
        encoding="utf-8",
    )
    (root / "umac" / "auth.txt").write_text(
        "鉴权配置\n用户鉴权失败时需要检查LDAP服务器连接，鉴权日志位于日志目录。\n",
        encoding="utf-8",
    )
    (root / "pathmap.json").write_text(
        json.dumps({"director/scale.txt": ["运维", "扩容"],
                    "director/backup.txt": ["运维", "备份"],
                    "umac/auth.txt": ["安全", "鉴权"]}),
        encoding="utf-8",
    )

    class FakeLLM:
        async def acomplete(self, prompt):
            class R:
                text = "答案"
            return R()

    cfg = EasyRAGConfig(
        re_only=False,
        retrieval_type=2,
        use_reranker=2,
        chunk_size=64,
        chunk_overlap=10,
        data_path=str(root),
        f_topk_2=8,
        f_topk_3=2,
        r_topk=2,
        serve_window_ms=60.0,
        tpu=TPUConfig(use_pallas=False, max_query_postings=2048),
    )
    fake = FakeScorer()
    reranker = LLMRerank(fake, top_n=2, embed_bs=4, embed_type=1)
    pipeline = EasyRAGPipeline(cfg, llm=FakeLLM(), reranker=reranker)
    app = create_app(pipeline)

    # create_app must have installed the coalescing proxy + thread hand-off
    assert isinstance(pipeline.reranker.scorer, CoalescingScorer)
    assert pipeline.rerank_in_thread

    async def drive():
        from aiohttp import ClientSession, web

        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]
        try:
            async with ClientSession() as sess:
                async def post(q):
                    async with sess.post(
                        f"http://127.0.0.1:{port}/v1/rag", json={"query": q}
                    ) as resp:
                        assert resp.status == 200
                        return await resp.json()

                return await asyncio.gather(
                    *(post(f"CDU虚机扩容的最大SC个数是多少？{i}") for i in range(4))
                )
        finally:
            await runner.cleanup()

    results = asyncio.new_event_loop().run_until_complete(drive())
    assert all(r["answer"] == "答案" and r["contexts"] for r in results)
    # sharing happened: the legacy per-request loop dispatches
    # ceil(p/embed_bs) batches per request; fused requests need fewer total
    total_pairs = sum(n for n, _, _ in fake.calls)
    assert total_pairs >= 4 * 2  # every request had candidates to score
    per_request = total_pairs // 4
    legacy_dispatches = 4 * -(-per_request // 4)
    assert len(fake.calls) < legacy_dispatches, (fake.calls, per_request)
    pipeline.reranker.scorer.close()


def test_coalesced_tail_chunk_pads_to_bucket():
    """The coalescer's tail chunk pads to the halving bucket (rerankers.
    tail_bucket), not max_batch: 38 fused pairs at max_batch=32 dispatch
    as 32 + 8."""
    fake = FakeScorer()
    proxy = CoalescingScorer(fake, max_batch=32, window_ms=20)
    reranker = LLMRerank(proxy, top_n=100, embed_bs=32, embed_type=0)
    out = reranker.postprocess_nodes(_nodes("a", 38), QueryBundle(query_str="q"))
    proxy.close()
    assert len(out) == 38
    assert [(n, j) for n, j, _ in fake.calls] == [(32, False), (8, False)]
    # telemetry records REAL pair counts (38 total)
    assert sum(proxy.dispatch_sizes) == 38


def test_cold_tail_bucket_never_compiles_on_the_latency_path():
    """A tail whose bucket shape has no warm compiled program dispatches at
    the always-warm max_batch; the bucket shape is warmed in queue-idle
    time and subsequent tails use it (coalesce._shape_key/_drain_warms)."""

    class TokenizingScorer(FakeScorer):
        # exposing build_inputs opts the scorer into shape-keyed warming
        def build_inputs(self, pairs):
            ids = np.zeros((len(pairs), 16), np.int32)
            return ids, np.ones_like(ids)

    fake = TokenizingScorer()
    proxy = CoalescingScorer(fake, max_batch=32, window_ms=5)
    reranker = LLMRerank(proxy, top_n=100, embed_bs=32, embed_type=0)

    out = reranker.postprocess_nodes(_nodes("a", 38), QueryBundle(query_str="q"))
    assert len(out) == 38
    # cold path: 32 + tail padded to the FULL batch (bucket 8 not warm yet)
    assert [n for n, j, _ in fake.calls[:2]] == [32, 32]
    # the deferred warm runs off the latency path: one 8-pair dummy dispatch
    deadline = time.time() + 5
    while len(fake.calls) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert [n for n, j, _ in fake.calls] == [32, 32, 8], fake.calls

    # warm path: the same tail shape now dispatches at the bucket
    out = reranker.postprocess_nodes(_nodes("b", 38), QueryBundle(query_str="q"))
    assert len(out) == 38
    proxy.close()
    assert [n for n, j, _ in fake.calls] == [32, 32, 8, 32, 8], fake.calls
    # telemetry records REAL pair counts throughout
    assert sum(proxy.dispatch_sizes) == 38 * 2
