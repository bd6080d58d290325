"""Serving benchmark under concurrency (VERDICT r2 item #5): drive the real
HTTP API (``serving/api.py``) with N concurrent full-RAG requests on the
co-resident system — generation stubbed, reranker real at 2B scale — with
the cross-request reranker coalescer ON vs OFF.

Reports p50/p99 request latency, aggregate qps, and the judge-batch worst
case: with early exit on, EVERY concurrent fresh query needs its own
un-fused judge batch (``serving/coalesce.py`` isolates judge batches by
design, so the worst case is C concurrent judge dispatches serializing on
the chip).

Run: python tools/bench_serving.py [--tiny] [--concurrency 4] [--requests 12]
     [--exit] [--no-coalesce]
"""

import argparse
import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_pipeline import build_system, make_query  # noqa: E402


async def drive(app, n_requests: int, concurrency: int, queries):
    """In-process aiohttp server on an ephemeral port + concurrent client
    load. Returns per-request latencies (seconds)."""
    from aiohttp import ClientSession, web

    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    url = f"http://127.0.0.1:{port}/v1/rag"

    latencies = []
    sem = asyncio.Semaphore(concurrency)

    # first requests ride cold remote compiles (minutes on a congested
    # attachment) and queue behind the one chip; never let the client
    # timeout shape the measurement
    from aiohttp import ClientTimeout

    async with ClientSession(timeout=ClientTimeout(total=3600)) as session:

        async def one(i):
            async with sem:
                t0 = time.perf_counter()
                async with session.post(
                    url, json={"query": queries[i % len(queries)]}
                ) as resp:
                    body = await resp.json()
                    assert resp.status == 200, body
                    assert body["contexts"]
                latencies.append(time.perf_counter() - t0)

        # warm (compiles) outside the timed window
        await one(0)
        latencies.clear()
        t0 = time.perf_counter()
        await asyncio.gather(*(one(i) for i in range(n_requests)))
        wall = time.perf_counter() - t0

    await runner.cleanup()
    return np.array(latencies), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--exit", dest="use_exit", action="store_true",
                    help="early exit on (judge-batch worst case)")
    ap.add_argument("--no-coalesce", action="store_true")
    ap.add_argument("--reranker-quant", default="", choices=["", "w8a8"],
                    help="boot the reranker w8a8 (s8 x s8 projections)")
    ap.add_argument("--cascade", type=int, default=0, metavar="KEEP",
                    help="two-stage cascade (use_efficient=3) with this "
                         "cascade_keep")
    ap.add_argument("--cascade-carry", action="store_true",
                    help="cascade stage 2 resumes from carried hidden")
    ap.add_argument("--local-llm", type=int, default=0, metavar="MAX_NEW",
                    help="REAL on-chip generation per request (7B int8 "
                         "KV-cache decode of MAX_NEW tokens) instead of "
                         "the stub")
    ap.add_argument("--gen-batch", type=int, default=0, metavar="B",
                    help="coalesce concurrent generations into batched "
                         "decodes (generation.BatchingLocalLLM, max B "
                         "rows; decode is weight-bandwidth-bound so rows "
                         "are ~free). 0 = per-request B=1 decode")
    ap.add_argument("--gen-continuous", type=int, default=0, metavar="B",
                    help="continuous batching: a B-slot decode pool that "
                         "concurrent requests JOIN at chunk boundaries "
                         "(generation.ContinuousBatchingLocalLLM) — the "
                         "staggered-arrival fix gen-batch can't provide")
    ap.add_argument("--local-llm-quant", default="int8",
                    choices=["int8", "int4"],
                    help="int4: nibble-packed weights (~4.3 GiB) + the "
                         "in-VMEM unpack decode kernel — co-fits with the "
                         "embedder (--with-embedder): the 4-tenant boot")
    ap.add_argument("--with-embedder", action="store_true",
                    help="boot the 7B int8 embedder too (the full "
                         "co-resident tenant set)")
    ap.add_argument("--embedder-quant", default="int8",
                    choices=["int8", "int4"],
                    help="embedder weight storage; int4 (~3.55 GiB) is "
                         "required for the 4-tenant boot WITH a decode "
                         "pool (pool KV tiers need the freed headroom)")
    ap.add_argument("--pool-tiers", default="",
                    help="per-bucket pool slot tiers for --gen-continuous, "
                         "e.g. 2048:2,7680:2 (tpu.local_llm_pool_tiers)")
    ap.add_argument("--gen-warmup", action="store_true",
                    help="pre-compile the generation executables before "
                         "the timed window (the tpu.local_llm_warmup boot "
                         "behavior; isolates steady-state from compiles)")
    args = ap.parse_args()

    from easyrag_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # steady-state p99 must not pay cold compiles

    from easyrag_tpu.serving.api import create_app

    ns = build_system(tiny=args.tiny, docs=args.docs,
                      with_embedder=args.with_embedder,
                      rr_quant=args.reranker_quant,
                      em_quant=args.embedder_quant)
    queries = [make_query(ns) for _ in range(max(args.requests, 8))]

    if args.use_exit:
        ns.scorer.use_efficient = 1
        ns.reranker.use_efficient = 1
        ns.scorer.efficient_t = 0.0  # judge always fires (see bench_pipeline)
    elif args.cascade:
        ns.reranker.use_efficient = 3
        ns.reranker.cascade_keep = args.cascade
        ns.reranker.cascade_carry = args.cascade_carry

    if args.local_llm:
        from bench_pipeline import make_local_llm

        gen = make_local_llm(
            args.local_llm, tiny=args.tiny, quant=args.local_llm_quant
        )
        if args.gen_continuous:
            from easyrag_tpu.config import parse_pool_tiers
            from easyrag_tpu.generation import ContinuousBatchingLocalLLM

            ns.pipeline.llm = ContinuousBatchingLocalLLM(
                gen, pool_size=args.gen_continuous,
                tiers=parse_pool_tiers(args.pool_tiers),
            )
        elif args.gen_batch:
            from easyrag_tpu.generation import BatchingLocalLLM

            ns.pipeline.llm = BatchingLocalLLM(
                gen,
                window_ms=ns.pipeline.config.serve_window_ms,
                max_batch=args.gen_batch,
            )
        else:
            ns.pipeline.llm = gen
        if args.gen_warmup:
            t0 = time.perf_counter()
            if args.gen_continuous:
                # per-tier chunk executables + (tier, bucket) prefill/
                # insert pairs — every bucket, like the api.py boot warmup
                ns.pipeline.llm.warmup(buckets=gen.buckets)
                sizes = "pool"
            else:
                # RECORDED warmup (r5, same trick as bench_pipeline): run
                # every request query once with generation swapped for a
                # prompt recorder — retrieval + rerank run for REAL
                # (pre-compiling that path too), then warm ONLY the
                # (bucket, B) pairs the timed load can dispatch: recorded
                # buckets x pow2 rows up to --gen-batch (coalesced B
                # depends on arrival timing, so every B at a recorded
                # bucket is reachable; unrecorded buckets are not). An
                # unwarmed pair is a multi-minute cold remote compile
                # INSIDE the timed window (r3's p99 63 s / 241 s).
                rec = []
                real_gb = gen.generate_batch
                gen.generate_batch = (
                    lambda ps: (rec.extend(ps), [""] * len(ps))[1]
                )
                wloop = asyncio.new_event_loop()
                for q in queries:
                    wloop.run_until_complete(ns.pipeline.run({"query": q}))
                wloop.close()
                gen.generate_batch = real_gb
                rec_buckets = sorted({b for b, _ in gen.plan_groups(rec)})
                bs = [x for x in (1, 2, 4, 8) if x <= max(args.gen_batch, 1)]
                sizes = [(b, x) for b in rec_buckets for x in bs]
                gen.warmup(pairs=sizes)
            print(f"gen warmup ({sizes}): {time.perf_counter() - t0:.1f} s",
                  file=sys.stderr)

    ns.pipeline.config.serve_coalesce_rerank = not args.no_coalesce
    app = create_app(ns.pipeline)
    coalesced = getattr(ns.pipeline.reranker.scorer, "coalesce", False)

    lat, wall = asyncio.new_event_loop().run_until_complete(
        drive(app, args.requests, args.concurrency, queries)
    )
    out = {
        "mode": (
            "exit@judge" if args.use_exit
            else f"cascade{args.cascade}" if args.cascade
            else "cutoff28"
        )
        + ("+carry" if args.cascade and args.cascade_carry else "")
        + (f"+gen{args.local_llm}" if args.local_llm else "")
        + (f"+gencont{args.gen_continuous}" if args.gen_continuous
           else f"+genbatch{args.gen_batch}" if args.gen_batch else "")
        + ("+coalesce" if coalesced else ""),
        "concurrency": args.concurrency,
        "requests": args.requests,
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1000, 1),
        "qps": round(args.requests / wall, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
