"""HTTP serving API.

Replaces the reference's FastAPI service (``src/api.py``): permissive CORS,
``GET /test`` smoke endpoint, ``POST /v1/rag`` taking
``{"query": ..., "document": optional}`` and returning
``{"answer", "contexts"}``. Built on aiohttp (fastapi is not in this image);
the route contract is identical so the reference's webui/clients work
unchanged.

Retrieval-only deployments (``re_only`` configs) get request
micro-batching: concurrent requests within a small window coalesce into one
device call through ``pipeline.run_retrieval_batch`` (the resident index
scores a whole batch for the price of one dispatch). Full-RAG deployments
instead get cross-request RERANKER coalescing (``serving/coalesce.py``):
concurrent requests' pair batches fuse into shared device dispatches.
Window/max-batch are config knobs (``serve_window_ms``, ``serve_max_batch``,
``serve_coalesce_rerank``).

Run:  python -m easyrag_tpu.serving.api --config configs/easyrag.yaml
"""

from __future__ import annotations

import argparse
import asyncio
from typing import Optional

from ..config import EasyRAGConfig, load_config
from ..pipeline import EasyRAGPipeline


class RetrievalBatcher:
    """Coalesce concurrent retrieval-only requests into device batches."""

    def __init__(
        self, pipeline: EasyRAGPipeline, window_ms: float = 4.0, max_batch: int = 32
    ) -> None:
        self.pipeline = pipeline
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self._pending: list = []
        self._flusher: Optional[asyncio.Task] = None

    async def run(self, query: dict) -> dict:
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self._pending.append((query, fut))
        if len(self._pending) >= self.max_batch:
            await self._flush()
        elif self._flusher is None or self._flusher.done():
            self._flusher = asyncio.ensure_future(self._delayed_flush())
        return await fut

    async def _delayed_flush(self) -> None:
        await asyncio.sleep(self.window)
        await self._flush()

    async def _flush(self) -> None:
        batch, self._pending = self._pending, []
        if not batch:
            return
        queries = [q for q, _ in batch]
        try:
            results = await self.pipeline.run_retrieval_batch(queries)
            for (_, fut), res in zip(batch, results):
                if not fut.done():
                    fut.set_result(res)
        except Exception as e:  # noqa: BLE001 — fail all waiters
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)


def create_app(pipeline: EasyRAGPipeline):
    from aiohttp import web

    routes = web.RouteTableDef()
    cfg = getattr(pipeline, "config", None)
    window_ms = getattr(cfg, "serve_window_ms", 4.0)
    max_batch = getattr(cfg, "serve_max_batch", 32)
    batcher = (
        RetrievalBatcher(pipeline, window_ms=window_ms, max_batch=max_batch)
        if pipeline.re_only and pipeline.rerank_fusion_type == 0
        else None
    )
    # full-RAG path: fuse reranker batches across concurrent requests — the
    # rerank stage dominates (SURVEY §3 hot loop #1), and per-request tail
    # batches waste padded slots that other requests' pairs can fill
    if (
        batcher is None
        and getattr(cfg, "serve_coalesce_rerank", True)
        and getattr(pipeline.reranker, "scorer", None) is not None
        and not getattr(pipeline.reranker.scorer, "coalesce", False)
    ):
        from .coalesce import CoalescingScorer

        pipeline.reranker.scorer = CoalescingScorer(
            pipeline.reranker.scorer,
            max_batch=getattr(pipeline.reranker, "embed_bs", max_batch),
            window_ms=window_ms,
        )
        pipeline.rerank_in_thread = True

    # boot-time generation warmup (tpu.local_llm_warmup): pre-compile the
    # decode executables for the top two prompt buckets at every pow2 batch
    # size the coalescer can produce — cold 7B compiles cost tens of
    # seconds each on a remote attachment and otherwise land on the first
    # unlucky requests (measured as the p99 spike in tools/bench_serving.py)
    local = getattr(pipeline, "local_llm", None)
    if (
        getattr(getattr(cfg, "tpu", None), "local_llm_warmup", False)
        and local is not None
        and hasattr(local, "warmup")
    ):
        gen_batch = getattr(cfg.tpu, "local_llm_gen_batch", 8)
        sizes = [b for b in (1, 2, 4, 8, 16, 32) if b <= gen_batch] or [1]
        if not getattr(cfg.tpu, "compile_cache_dir", ""):
            # full-coverage warmup compiles every (bucket, B) pair; at 7B a
            # single cold compile on a remote attachment costs minutes-to-
            # tens-of-minutes (utils/compile_cache.py numbers) — without
            # the persistent executable cache a cold boot can take hours
            print(
                "[serving] WARNING: tpu.local_llm_warmup is set but "
                "tpu.compile_cache_dir is not — every (bucket, batch) "
                "decode executable cold-compiles at boot. Set "
                "tpu.compile_cache_dir so warm boots reuse compiled "
                "executables.",
                flush=True,
            )
        # warm EVERY (bucket, B) pair the server can hit — real prompts
        # touch every bucket, and any cold pair lands a tens-of-seconds
        # compile on an unlucky request (the measured p99 spike; r3 warmed
        # only the top two buckets and the tail stayed cold-dominated)
        import time as _time

        _t0 = _time.perf_counter()
        # continuous batching compiles its own executables (one chunk +
        # per-bucket prefill/insert) — warm the pool, not generate_greedy
        wrapper = getattr(pipeline, "llm", None)
        if getattr(cfg.tpu, "local_llm_continuous", False) and hasattr(
            wrapper, "pool"
        ):
            wrapper.warmup(buckets=local.buckets)
        else:
            local.warmup(buckets=local.buckets, batch_sizes=sizes)
        print(
            f"[serving] generation warmup: buckets={list(local.buckets)} "
            f"batch_sizes={sizes} in {_time.perf_counter() - _t0:.1f}s",
            flush=True,
        )

    @routes.get("/test")
    async def test(_request):
        return web.json_response("hello rag")

    @routes.get("/ui")
    async def ui(_request):
        # dependency-free browser client (the reference's streamlit layout
        # without the streamlit runtime — src/webui.py:20-47)
        from .webui import HTML_PAGE

        return web.Response(text=HTML_PAGE, content_type="text/html")

    @routes.post("/v1/rag")
    async def rag(request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "body must be JSON"}, status=400)
        query = {
            "query": body.get("query", ""),
            "document": body.get("document", ""),
        }
        try:
            if batcher is not None:
                res = await batcher.run(query)
            else:
                res = await pipeline.run(query)
        except Exception as e:  # noqa: BLE001 — surface as clean JSON 500
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response(
            {"answer": res["answer"], "contexts": res["contexts"]}
        )

    app = web.Application()
    app.add_routes(routes)

    # permissive CORS (api.py:24-30)
    async def cors_mw(app_, handler):
        async def middleware(request):
            if request.method == "OPTIONS":
                resp = web.Response()
            else:
                resp = await handler(request)
            resp.headers["Access-Control-Allow-Origin"] = "*"
            resp.headers["Access-Control-Allow-Methods"] = "*"
            resp.headers["Access-Control-Allow-Headers"] = "*"
            return resp

        return middleware

    app.middlewares.append(cors_mw)
    return app


def serve(
    config: Optional[EasyRAGConfig] = None,
    pipeline: Optional[EasyRAGPipeline] = None,
    host: str = "0.0.0.0",
    port: int = 8000,
) -> None:
    from aiohttp import web

    if pipeline is None:
        pipeline = EasyRAGPipeline(config)
    web.run_app(create_app(pipeline), host=host, port=port)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/easyrag.yaml")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args()
    serve(config=load_config(args.config), host=args.host, port=args.port)
