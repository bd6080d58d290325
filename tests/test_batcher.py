"""Serving micro-batcher: window coalescing, max-batch flush, error fanout."""

import asyncio

from easyrag_tpu.serving.api import RetrievalBatcher


class FakePipeline:
    def __init__(self):
        self.calls = []

    async def run_retrieval_batch(self, queries):
        self.calls.append(len(queries))
        return [{"answer": "", "nodes": [], "contexts": [q["query"]]} for q in queries]


def test_window_coalescing():
    pipeline = FakePipeline()
    batcher = RetrievalBatcher(pipeline, window_ms=10, max_batch=8)

    async def drive():
        return await asyncio.gather(
            *(batcher.run({"query": f"q{i}"}) for i in range(3))
        )

    results = asyncio.new_event_loop().run_until_complete(drive())
    assert [r["contexts"] for r in results] == [["q0"], ["q1"], ["q2"]]
    assert pipeline.calls == [3]  # one coalesced device batch


def test_max_batch_flushes_immediately():
    pipeline = FakePipeline()
    batcher = RetrievalBatcher(pipeline, window_ms=1000, max_batch=2)

    async def drive():
        return await asyncio.gather(
            *(batcher.run({"query": f"q{i}"}) for i in range(4))
        )

    loop = asyncio.new_event_loop()
    results = loop.run_until_complete(asyncio.wait_for(drive(), timeout=2))
    assert len(results) == 4
    assert all(c == 2 for c in pipeline.calls)  # flushed at max_batch, not window


def test_error_fans_out_to_all_waiters():
    class Boom:
        async def run_retrieval_batch(self, queries):
            raise RuntimeError("index gone")

    batcher = RetrievalBatcher(Boom(), window_ms=5, max_batch=8)

    async def drive():
        futs = [batcher.run({"query": "a"}), batcher.run({"query": "b"})]
        return await asyncio.gather(*futs, return_exceptions=True)

    out = asyncio.new_event_loop().run_until_complete(drive())
    assert all(isinstance(e, RuntimeError) for e in out)
