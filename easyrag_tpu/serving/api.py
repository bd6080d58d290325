"""HTTP serving API.

Replaces the reference's FastAPI service (``src/api.py``): permissive CORS,
``GET /test`` smoke endpoint, ``POST /v1/rag`` taking
``{"query": ..., "document": optional}`` and returning
``{"answer", "contexts"}``. Built on aiohttp (fastapi is not in this image);
the route contract is identical so the reference's webui/clients work
unchanged.

Run:  python -m easyrag_tpu.serving.api --config configs/easyrag.yaml
"""

from __future__ import annotations

import argparse
from typing import Optional

from ..config import EasyRAGConfig, load_config
from ..pipeline import EasyRAGPipeline


def create_app(pipeline: EasyRAGPipeline):
    from aiohttp import web

    routes = web.RouteTableDef()

    @routes.get("/test")
    async def test(_request):
        return web.json_response("hello rag")

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
        res = await pipeline.run(query)
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
